"""acquisition.json metadata source (SURVEY.md §2.1 S5/S6, §2.2 P2).

The reference reads the file into an untyped dict and picks
``tiles[0].coordinate_transformations[type=="scale"].scale``
(`smartspim_job.py:65-90`); here the same extraction is a declared
``StructType`` + ``explode``/``filter`` DataFrame expression —
schema-on-read with an explicit schema, so Catalyst prunes everything
except the two leaves actually consumed.

Golden (reference fixture): scale [1.8, 1.8, 2.0] (XYZ) → voxel
resolution [2.0, 1.8, 1.8] (ZYX).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ACQUISITION_SCHEMA = T.StructType(
    [
        T.StructField(
            "tiles",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "channel",
                            T.StructType(
                                [
                                    T.StructField("channel_name", T.StringType()),
                                    T.StructField("laser_wavelength", T.IntegerType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "coordinate_transformations",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("type", T.StringType()),
                                        T.StructField("scale", T.ArrayType(T.DoubleType())),
                                        T.StructField(
                                            "translation", T.ArrayType(T.DoubleType())
                                        ),
                                    ]
                                )
                            ),
                        ),
                        T.StructField("file_name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_acquisition(spark: SparkSession, path: str):
    """Load acquisition.json with the declared schema (multiLine JSON)."""
    import os

    if not os.path.isfile(path):
        # same contract as the reference (`smartspim_job.py:69-72`)
        raise FileNotFoundError(f"acquisition.json file not found at: {path}")
    return spark.read.schema(ACQUISITION_SCHEMA).option("multiLine", "true").json(path)


def get_voxel_resolution(spark: SparkSession, path: str) -> list[float]:
    """ZYX voxel size from the first tile's scale transform."""
    df = read_acquisition(spark, path)
    row = (
        df.select(F.explode(F.col("tiles")).alias("tile"))
        .limit(1)
        .select(F.explode("tile.coordinate_transformations").alias("ct"))
        .filter(F.col("ct.type") == "scale")
        .select("ct.scale")
        .first()
    )
    x, y, z = (float(v) for v in row["scale"][:3])
    return [z, y, x]
