"""Training-CSV source + the cleaning pipeline (SURVEY §2.1 S3, §2.2 P2-P8).

Re-expresses the reference's CSV ingestion semantics
(spark_app/train_rf.py:16-40, spark_app/predict_rf.py:15-33):

  glob read with header → strip/rename columns (space/dot → underscore)
  → drop id/leak columns if present → label clean (upper ∘ trim) → binary
  label → ±inf → null scrub on every numeric column → dropna.

Differences by design (SURVEY §1.3): we take an explicit schema when the
caller has one (inference = an extra full scan at 100 TB) and the inf
scrub is a single select, not ~80 chained withColumn projections — one
Project node instead of 80 nested ones, which keeps the analyzed plan
small and the whole thing in one codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# columns the reference drops when present (train_rf.py:26-27)
ID_LEAK_COLS = (
    "Unnamed_0",
    "Unnamed:_0",  # pandas index column: "Unnamed: 0" after normalization
    "Flow_ID",
    "Source_IP",
    "Destination_IP",
    "Timestamp",
    "SimillarHTTP",
)

LABEL_RAW = "Label"
LABEL_BIN = "binary_label"


def clean_name(name: str) -> str:
    """Column-name normalization: strip, space/dot → underscore
    (train_rf.py:19-23)."""
    return name.strip().replace(" ", "_").replace(".", "_")


def read_training_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Header CSV glob read; explicit schema preferred over inference."""
    reader = spark.read.option("header", True)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def normalize_columns(df: DataFrame) -> DataFrame:
    """Bulk rename via toDF — one Project node."""
    return df.toDF(*[clean_name(c) for c in df.columns])


def drop_id_columns(df: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    present = [c for c in (*ID_LEAK_COLS, *extra) if c in df.columns]
    return df.drop(*present) if present else df


def scrub_inf(df: DataFrame) -> DataFrame:
    """±inf → null on every float/double column, in ONE select."""
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    }
    cols = [
        F.when(F.col(c).isin(float("inf"), float("-inf")), None)
        .otherwise(F.col(c))
        .alias(c)
        if c in numeric
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def binarize_label(df: DataFrame, benign: str = "BENIGN") -> DataFrame:
    """upper(trim(label)) != benign → 1.0 else 0.0 (train_rf.py:30-33)."""
    lbl = F.upper(F.trim(F.col(LABEL_RAW)))
    return df.withColumn(
        LABEL_BIN, F.when(lbl == benign, F.lit(0.0)).otherwise(F.lit(1.0))
    )


def clean_training_frame(df: DataFrame, benign: str = "BENIGN") -> DataFrame:
    """The full S3 cleaning pipeline, composed."""
    df = drop_id_columns(normalize_columns(df))
    if LABEL_RAW in df.columns:
        df = binarize_label(df, benign)
    return scrub_inf(df).na.drop()


def select_expected_features(df: DataFrame, expected: list[str]) -> DataFrame:
    """Schema-intersection selection against an expected-features list
    (main.py:1072-1084, expected_features.txt) — keeps order of
    `expected`, silently skipping absent columns."""
    present = set(df.columns)
    return df.select(*[c for c in expected if c in present])
