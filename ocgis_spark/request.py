"""RequestDataset / Field — the reference's entry-point data model
re-expressed over DataFrames.

Reference: ``RequestDataset`` (``driver/request/core.py:30-235``) wraps a
URI + interpretation overrides and lazily produces a ``Field``
(``collection/field.py:23``) whose ``DimensionMap`` binds variables to
semantic axes (realization/time/level/y/x/geom). Here a Field is a long-form
DataFrame + a dimension map of axis → column name + a GridSpec; laziness
and hyperslab pushdown come from Spark (parquet column pruning/predicate
pushdown replaces ``_src_idx`` hyperslab reads, ``driver/base.py:596-644``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo.cellindex import GridSpec

#: default axis → column convention (DimensionMap analogue)
DEFAULT_DIMENSION_MAP = {
    "time": "ts",
    "x": "lon",
    "y": "lat",
    "level": "level",
    "value": "value",
}


@dataclass
class Field:
    """Long-form field: one row per (time x cell [x level]) sample."""

    df: DataFrame
    dimension_map: dict[str, str]
    grid: GridSpec | None = None

    def axis(self, name: str) -> str:
        try:
            return self.dimension_map[name]
        except KeyError:
            raise KeyError(f"axis {name!r} not in dimension map") from None

    @property
    def time(self):
        return F.col(self.axis("time"))

    @property
    def x(self):
        return F.col(self.axis("x"))

    @property
    def y(self):
        return F.col(self.axis("y"))

    @property
    def data_variables(self) -> list[str]:
        return [self.dimension_map.get("value", "value")]

    def get_field_slice(self, slices: dict[str, int]) -> "Field":
        """Label-based positional slicing (``field.py:561-604``): keep the
        n-th distinct coordinate along each named axis — expressed as a
        dense_rank predicate, no positional arrays needed."""
        from pyspark.sql import Window

        out = self.df
        for axis_name, idx in slices.items():
            col = self.axis(axis_name)
            w = Window.orderBy(col)
            ranked = (
                out.select(col).distinct()
                .withColumn("_rk", F.dense_rank().over(w) - 1)
                .filter(F.col("_rk") == idx)
                .drop("_rk")
            )
            out = out.join(F.broadcast(ranked), col, "leftsemi")
        return Field(out, self.dimension_map, self.grid)

    def write(self, path: str, driver: str = "parquet") -> str:
        """Persist the field (``Field.write``, reference
        ``collection/field.py:1050-1073``) via the converter registry —
        every sink also emits a conv_meta lineage record."""
        from . import conv

        writer = conv.get_converter_map()[driver]
        return writer(self.df, path, {"dimension_map": self.dimension_map})

    def rename_variable(self, old: str, new: str) -> "Field":
        dm = {k: (new if v == old else v) for k, v in self.dimension_map.items()}
        return Field(self.df.withColumnRenamed(old, new), dm, self.grid)


@dataclass
class RequestDataset:
    """Lazy dataset request (``driver/request/core.py``). ``uri`` is one or
    many parquet paths (many = concatenated, MultiRequestDataset
    ``driver/request/multi_request.py``)."""

    uri: str | list[str]
    variable: str | list[str] | None = None
    rename_variable: str | None = None
    dimension_map: dict[str, str] = dc_field(default_factory=lambda: dict(DEFAULT_DIMENSION_MAP))
    grid: GridSpec | None = None
    predicate: object = None  # variable-name filter fn (core.py:121-124)
    driver: str = "parquet"  # 'parquet' | 'csv' (DriverCSV, csv_.py:1-79)
    #: CF-numeric time axis declaration (reference RequestDataset
    #: t_units/t_calendar, driver/request/core.py:142-235): when set,
    #: ``OcgOperations(format_time=True)`` (the default) attaches decoded
    #: calendar parts (cf_year/cf_month/cf_day — the value_datetime
    #: analogue) via cfcalendar.decode_time; format_time=False leaves the
    #: raw numeric axis untouched
    time_units: str | None = None
    time_calendar: str = "standard"

    def _read_one(self, spark: SparkSession, uri: str) -> DataFrame:
        if self.driver == "csv":
            return spark.read.option("header", True).option(
                "inferSchema", True
            ).csv(uri)
        return spark.read.parquet(uri)

    def get(self, spark: SparkSession) -> Field:
        uris = self.uri if isinstance(self.uri, list) else [self.uri]
        df = self._read_one(spark, uris[0])
        for u in uris[1:]:
            df = df.unionByName(self._read_one(spark, u), allowMissingColumns=True)
        if self.predicate is not None:
            keep = [c for c in df.columns if self.predicate(c)
                    or c in self.dimension_map.values()]
            df = df.select(*keep)
        if self.variable is not None:
            wanted = ([self.variable] if isinstance(self.variable, str)
                      else list(self.variable))
            axes = [v for v in self.dimension_map.values() if v in df.columns]
            df = df.select(*dict.fromkeys(axes + wanted))
            dm = dict(self.dimension_map)
            dm["value"] = wanted[0]
        else:
            dm = dict(self.dimension_map)
        fld = Field(df, dm, self.grid)
        if self.rename_variable:
            fld = fld.rename_variable(dm["value"], self.rename_variable)
        return fld
