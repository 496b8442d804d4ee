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


# Typed parse-back schema for the full AttributeValue union — the
# heterogeneous L is an array of the one-tag-per-element struct
# (from_json nulls the absent tags), exactly how a typed consumer
# reads DynamoDB-JSON without inference.
_AV_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StructType([T.StructField("N", T.StringType())])),
        T.StructField("props", T.StructType([T.StructField("S", T.StringType())])),
        T.StructField("flag", T.StructType([T.StructField("BOOL", T.BooleanType())])),
        T.StructField("nothing", T.StructType([T.StructField("NULL", T.BooleanType())])),
        T.StructField("blob", T.StructType([T.StructField("B", T.StringType())])),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField(
                        "M",
                        T.StructType(
                            [
                                T.StructField("k", T.StructType([T.StructField("S", T.StringType())])),
                                T.StructField("n", T.StructType([T.StructField("N", T.StringType())])),
                            ]
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "items",
            T.StructType(
                [
                    T.StructField(
                        "L",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("S", T.StringType()),
                                    T.StructField("N", T.StringType()),
                                    T.StructField("BOOL", T.BooleanType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        T.StructField("tags", T.StructType([T.StructField("SS", T.ArrayType(T.StringType()))])),
        T.StructField("nums", T.StructType([T.StructField("NS", T.ArrayType(T.StringType()))])),
        T.StructField("blobs", T.StructType([T.StructField("BS", T.ArrayType(T.StringType()))])),
    ]
)


@register(
    "q_cdc_attrvalue_roundtrip",
    oracle=with_changelog(
        """
SELECT key, seq_no,
       CASE WHEN op <> 'REMOVE' THEN payload_value END AS payload_value,
       CASE WHEN op <> 'REMOVE' THEN payload_props END AS payload_props,
       (op <> 'REMOVE') AS has_image,
       CASE WHEN op <> 'REMOVE' THEN (key % 2 = 0) END AS flag_bool,
       CASE WHEN op <> 'REMOVE' THEN TRUE END AS null_tag,
       CASE WHEN op <> 'REMOVE' THEN payload_props END AS blob_text,
       CASE WHEN op <> 'REMOVE' THEN key END AS meta_n,
       CASE WHEN op <> 'REMOVE' THEN CAST(3 AS BIGINT) END AS list_len,
       CASE WHEN op <> 'REMOVE' THEN payload_value END AS list_n,
       CASE WHEN op <> 'REMOVE'
            THEN payload_props || ',' || payload_props || '_2' END AS ss_csv,
       CASE WHEN op <> 'REMOVE' THEN key + seq_no END AS ns_sum,
       CASE WHEN op <> 'REMOVE' THEN payload_props END AS bs_text
FROM (
    SELECT key, seq_no, op, payload_value, payload_props,
           row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
    FROM changelog
) WHERE rn = 1
"""
    ),
)
def q_cdc_attrvalue_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DynamoDB AttributeValue tagged-union round trip (SURVEY §1.2),
    widened round 14 to the FULL union the wire format carries
    (`lambda-backfill/main.py:35-39` passes items through opaquely, so
    every tag a real table uses must survive the detour): numbers as
    `{"N": "<decimal string>"}`, strings as `{"S": ...}`, plus B
    (base64 bytes), BOOL, NULL, M (nested map), L (heterogeneous
    list), and the SS/NS/BS sets. The item is serialized in
    DynamoDB-JSON convention, parsed back with a TYPED from_json
    schema (never inference), and normalized to one output column per
    tag. The decimal-string N convention is what makes the round trip
    exact (the float is pinned to its %.2f text form), base64 makes B
    byte-exact, and the oracle computes every expected value straight
    from the changelog — any serialization loss breaks the hash."""
    # rebalance before the tagged-union serialize: the changelog scan is
    # one input split, so the to_json/from_json detour — the query's
    # whole point and cost — would run on a single core (r15 profile:
    # a 2.5 s one-task stage)
    cl = changelog(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    b64_props = F.base64(F.col("payload_props").cast("binary"))
    image = F.when(
        F.col("op") != "REMOVE",
        F.to_json(
            F.struct(
                F.struct(F.format_string("%.2f", F.col("payload_value")).alias("N")).alias("value"),
                F.struct(F.col("payload_props").alias("S")).alias("props"),
                F.struct((F.col("key") % 2 == 0).alias("BOOL")).alias("flag"),
                F.struct(F.lit(True).alias("NULL")).alias("nothing"),
                F.struct(b64_props.alias("B")).alias("blob"),
                F.struct(
                    F.struct(
                        F.struct(F.col("payload_props").alias("S")).alias("k"),
                        F.struct(F.col("key").cast("string").alias("N")).alias("n"),
                    ).alias("M")
                ).alias("meta"),
                # heterogeneous L: one tag per element — to_json drops
                # the null tags, leaving DynamoDB-JSON exactly
                F.struct(
                    F.array(
                        F.struct(
                            F.col("payload_props").alias("S"),
                            F.lit(None).cast("string").alias("N"),
                            F.lit(None).cast("boolean").alias("BOOL"),
                        ),
                        F.struct(
                            F.lit(None).cast("string").alias("S"),
                            F.format_string("%.2f", F.col("payload_value")).alias("N"),
                            F.lit(None).cast("boolean").alias("BOOL"),
                        ),
                        F.struct(
                            F.lit(None).cast("string").alias("S"),
                            F.lit(None).cast("string").alias("N"),
                            (F.col("key") % 2 == 0).alias("BOOL"),
                        ),
                    ).alias("L")
                ).alias("items"),
                F.struct(
                    F.array(
                        F.col("payload_props"),
                        F.concat(F.col("payload_props"), F.lit("_2")),
                    ).alias("SS")
                ).alias("tags"),
                F.struct(
                    F.array(
                        F.col("key").cast("string"),
                        F.col("seq_no").cast("string"),
                    ).alias("NS")
                ).alias("nums"),
                F.struct(F.array(b64_props).alias("BS")).alias("blobs"),
            )
        ),
    )
    serialized = cl.select("key", "seq_no", "op", image.alias("av_image"))
    img = F.from_json("av_image", _AV_IMAGE_SCHEMA)
    parsed = serialized.select(
        "key",
        "seq_no",
        "op",
        img.alias("img"),
        F.col("av_image").isNotNull().alias("has_image"),
    ).select(
        "key",
        "seq_no",
        "op",
        "has_image",
        F.col("img.value.N").cast("double").alias("payload_value"),
        F.col("img.props.S").alias("payload_props"),
        F.col("img.flag.BOOL").alias("flag_bool"),
        F.col("img").getField("nothing").getField("NULL").alias("null_tag"),
        F.unbase64(F.col("img.blob.B")).cast("string").alias("blob_text"),
        F.col("img.meta.M.n.N").cast("long").alias("meta_n"),
        F.size("img.items.L").cast("long").alias("list_len"),
        F.element_at("img.items.L", 2).getField("N").cast("double").alias("list_n"),
        F.array_join("img.tags.SS", ",").alias("ss_csv"),
        F.aggregate(
            F.transform("img.nums.NS", lambda x: x.cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("ns_sum"),
        F.unbase64(F.element_at("img.blobs.BS", 1)).cast("string").alias("bs_text"),
    )
    return latest_per_key(parsed).select(
        "key", "seq_no", "payload_value", "payload_props", "has_image",
        "flag_bool", "null_tag", "blob_text", "meta_n", "list_len",
        "list_n", "ss_csv", "ns_sum", "bs_text",
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
    # same one-split rebalance as the AttributeValue drill: the JSON
    # detour is the per-row cost worth spreading
    cl = changelog(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    enveloped = to_envelope_json(cl)
    reparsed = parse_envelope(enveloped)
    return latest_per_key(reparsed).select("key", "seq_no", "op", "payload_value")
