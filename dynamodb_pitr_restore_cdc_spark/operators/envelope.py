"""DynamoDB-Streams envelope handling (reference A8/A10/A11/A12).

The reference consumes stream records shaped
``{"eventName": ..., "dynamodb": {"Keys": ..., "NewImage": ...,
"SequenceNumber": ...}}`` and passes payloads through opaquely
(lambda-backfill/main.py:32-39). Here the envelope is a typed nested
StructType: serialization is `to_json(struct(...))`, parsing is
`from_json` with an explicit schema — never schema inference — and
payload projection is a nested-field select, all inside codegen.

The registered query proves round-trip fidelity: changelog → envelope
JSON → parse → classify/project → net effect, oracle-checked against
the changelog-direct SQL (the JSON detour must be value-lossless,
including doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .cdc import changelog, latest_per_key, with_changelog

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("eventID", T.StringType()),
        T.StructField("eventName", T.StringType()),
        T.StructField(
            "dynamodb",
            T.StructType(
                [
                    T.StructField("SequenceNumber", T.LongType()),
                    T.StructField("Keys", T.StructType([T.StructField("key", T.LongType())])),
                    T.StructField(
                        "NewImage",
                        T.StructType(
                            [
                                T.StructField("value", T.DoubleType()),
                                T.StructField("props", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def to_envelope_json(cl: DataFrame) -> DataFrame:
    """changelog -> (seq_no, body) where body is a stream-record JSON
    string (A3's json.dumps per record, cdc-to-sqs/main.py:33)."""
    op_to_event = F.col("op")  # op names already match eventName values
    new_image = F.when(
        F.col("op") != "REMOVE",
        F.struct(
            F.col("payload_value").alias("value"),
            F.col("payload_props").alias("props"),
        ),
    )
    body = F.to_json(
        F.struct(
            F.col("content_hash").alias("eventID"),
            op_to_event.alias("eventName"),
            F.struct(
                F.col("seq_no").alias("SequenceNumber"),
                F.struct(F.col("key").alias("key")).alias("Keys"),
                new_image.alias("NewImage"),
            ).alias("dynamodb"),
        )
    )
    return cl.select(F.col("seq_no"), body.alias("body"))


def parse_envelope(raw: DataFrame, body_col: str = "body") -> DataFrame:
    """A8: json.loads -> typed envelope -> changelog-shaped columns."""
    parsed = raw.select(F.from_json(F.col(body_col), ENVELOPE_SCHEMA).alias("r"))
    return parsed.select(
        F.col("r.dynamodb.SequenceNumber").alias("seq_no"),
        F.col("r.eventName").alias("op"),
        F.col("r.dynamodb.Keys.key").alias("key"),
        F.col("r.dynamodb.NewImage.value").alias("payload_value"),
        F.col("r.dynamodb.NewImage.props").alias("payload_props"),
    )


@register(
    "q_cdc_attrvalue_roundtrip",
    oracle=with_changelog(
        """
SELECT key, seq_no,
       CASE WHEN op <> 'REMOVE' THEN payload_value END AS payload_value,
       CASE WHEN op <> 'REMOVE' THEN payload_props END AS payload_props,
       (op <> 'REMOVE') AS has_image
FROM (
    SELECT key, seq_no, op, payload_value, payload_props,
           row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
    FROM changelog
) WHERE rn = 1
"""
    ),
)
def q_cdc_attrvalue_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DynamoDB AttributeValue tagged-union round trip (SURVEY §1.2): the
    item image is serialized in DynamoDB-JSON convention — numbers as
    `{"N": "<decimal string>"}` (arbitrary precision on the wire),
    strings as `{"S": ...}` — then normalized back to typed columns.
    The decimal-string N convention is what makes the round trip exact:
    the float is pinned to its %.2f text form before serialization, so
    parse-back reproduces the value bit-for-bit (the oracle computes
    straight from the changelog)."""
    cl = changelog(spark, sf_dir)
    image = F.when(
        F.col("op") != "REMOVE",
        F.to_json(
            F.struct(
                F.struct(F.format_string("%.2f", F.col("payload_value")).alias("N")).alias("value"),
                F.struct(F.col("payload_props").alias("S")).alias("props"),
            )
        ),
    )
    serialized = cl.select("key", "seq_no", "op", image.alias("av_image"))
    parsed = serialized.select(
        "key",
        "seq_no",
        "op",
        F.get_json_object("av_image", "$.value.N").cast("double").alias("payload_value"),
        F.get_json_object("av_image", "$.props.S").alias("payload_props"),
        F.col("av_image").isNotNull().alias("has_image"),
    )
    return latest_per_key(parsed).select(
        "key", "seq_no", "payload_value", "payload_props", "has_image"
    )


@register(
    "q_cdc_envelope_roundtrip",
    oracle=with_changelog(
        """
SELECT key, seq_no, op,
       CASE WHEN op <> 'REMOVE' THEN payload_value END AS payload_value
FROM (
    SELECT key, seq_no, op, payload_value,
           row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
    FROM changelog
) WHERE rn = 1
"""
    ),
)
def q_cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize every change event to a DynamoDB-Streams-style JSON body,
    parse it back with the typed envelope schema, and reduce to net
    effect per key. The oracle bypasses the JSON detour entirely — any
    serialization loss (doubles, nulls for REMOVE images) would break
    the hash match."""
    cl = changelog(spark, sf_dir)
    enveloped = to_envelope_json(cl)
    reparsed = parse_envelope(enveloped)
    return latest_per_key(reparsed).select("key", "seq_no", "op", "payload_value")
