"""Multimodal column queries — binary payload plumbing + stubbed decode
(SURVEY.md M5 / task brief: schema, partitioning, UDF signature and batch
shape are real; only the codec is a deterministic fake)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators import multimodal as M
from pucminas_data_pipelines_spark.operators import ordered as ORD
from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS asset_id,
      CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      'png' AS format,
      md5(text) AS checksum
    FROM documents
    ORDER BY asset_id
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata struct (byte length, format
    tag, content checksum) — all expression-level, no decode needed."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text")
    return assets.select(
        "asset_id",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.format").alias("format"),
        F.col("meta.checksum").alias("checksum"),
    ).orderBy("asset_id")


@query(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id AS asset_id,
      CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
      'png' AS format,
      CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
    FROM documents
    ORDER BY asset_id
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (stub codec): the oracle reproduces
    the stub's deterministic geometry; the feature vector column is checked
    by pytest (not SQL-expressible)."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text")
    return (
        M.decode_assets(assets)
        .select("asset_id", "byte_len", "format", "width", "height")
        .orderBy("asset_id")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS asset_id,
      CAST(j AS INTEGER) AS frame_no,
      CAST(j * 64 AS INTEGER) AS "offset"
    FROM documents CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS j)
    WHERE j * 64 < octet_length(encode(text))
    ORDER BY asset_id, frame_no
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video analogue): bounded per-asset slice
    positions, expression-only."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text")
    return M.sample_frames(assets).orderBy("asset_id", "frame_no")


@query(
    "multimodal_resize_stub",
    oracle="""
    WITH g AS (
      SELECT doc_id AS asset_id,
        octet_length(encode(text)) % 640 + 1 AS w,
        octet_length(encode(text)) % 480 + 1 AS h
      FROM documents
    ),
    s AS (
      SELECT asset_id, w, h,
        LEAST(256.0 / w, 256.0 / h, 1.0) AS scale
      FROM g
    )
    SELECT asset_id,
      CAST(w AS INTEGER) AS width,
      CAST(h AS INTEGER) AS height,
      CAST(GREATEST(FLOOR(w * scale), 1) AS INTEGER) AS resized_width,
      CAST(GREATEST(FLOOR(h * scale), 1) AS INTEGER) AS resized_height
    FROM s
    ORDER BY asset_id
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained mapInPandas decode → resize (stub codecs): aspect-preserving
    fit into 256x256, no upscaling. The oracle reproduces the deterministic
    geometry; the halved feature vector is pinned by pytest."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text")
    return (
        M.resize_assets(M.decode_assets(assets))
        .select("asset_id", "width", "height", "resized_width", "resized_height")
        .orderBy("asset_id")
    )


@query(
    "multimodal_payload_dedup",
    oracle="""
    SELECT md5(text) AS checksum,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS n_copies,
           CAST(MIN(octet_length(encode(text))) AS INTEGER) AS byte_len,
           CAST((COUNT(*) - 1) * MIN(octet_length(encode(text))) AS BIGINT)
             AS reclaimable_bytes
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    ORDER BY checksum
    """,
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset dedup by content checksum with storage accounting:
    the same image/audio blob referenced by many documents collapses to
    one stored copy (reclaimable_bytes = what a content-addressed store
    saves). The multimodal twin of exact text dedup — the groupBy key is
    the 16-byte checksum, never the payload, so the shuffle moves hashes
    and counts, not blobs (the invariant that matters when payloads are
    megabytes)."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text")
    return (
        assets.select(
            F.col("meta.checksum").alias("checksum"),
            "asset_id",
            F.col("meta.byte_len").alias("byte_len"),
        )
        .groupBy("checksum")
        .agg(
            F.min("asset_id").alias("representative_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("byte_len").cast("int").alias("byte_len"),
            ((F.count(F.lit(1)) - 1) * F.min("byte_len"))
            .cast("bigint")
            .alias("reclaimable_bytes"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("checksum")
    )


@query(
    "multimodal_bytes_stats_arrow",
    oracle="""
    SELECT doc_id AS asset_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
      CASE WHEN length(text) = 0 THEN NULL
           ELSE CAST(ord(substring(text, 1, 1)) AS INTEGER) END AS first_byte,
      CASE WHEN length(text) = 0 THEN NULL
           ELSE CAST(ord(substring(text, length(text), 1)) AS INTEGER) END
        AS last_byte
    FROM documents
    ORDER BY asset_id
    """,
)
def multimodal_bytes_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw payload byte stats via mapInArrow (zero-copy Arrow kernels on
    the binary column — no pandas materialization). Oracle relies on the
    corpus being pure ASCII (verified: octet_length == char length at
    every SF), so char ops on text mirror byte ops on the payload."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text")
    return M.payload_byte_stats(assets).orderBy("asset_id")


@query(
    "multimodal_webdataset_shard_layout",
    oracle="""
    WITH sized AS (
      SELECT doc_id AS asset_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      FROM documents
    ),
    laid AS (
      SELECT asset_id, byte_len,
             SUM(byte_len) OVER (ORDER BY asset_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum_end
      FROM sized
    ),
    placed AS (
      SELECT asset_id, byte_len,
             CAST(FLOOR((cum_end - byte_len) / 65536.0) AS BIGINT) AS shard_id
      FROM laid
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(byte_len) AS BIGINT) AS shard_bytes,
           MIN(asset_id) AS first_asset,
           MAX(asset_id) AS last_asset
    FROM placed
    GROUP BY shard_id
    ORDER BY shard_id
    """,
)
def multimodal_webdataset_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard layout for binary training assets: assets are
    packed in deterministic key order into ~64 KiB shards by cumulative
    byte offset (shard = floor(start_offset / shard_size)), the manifest a
    tar-shard writer needs (asset -> shard; in-shard offsets anchor at the
    shard's first asset — see multimodal_shard_roundtrip, which extracts
    bytes back through them). Training loaders then
    read whole shards sequentially instead of issuing one random GET per
    asset — the I/O pattern that makes 100 TB multimodal training feasible.

    Scale: the cumulative offset is the two-pass range-partitioned
    prefix sum (operators/ordered.py: per-bucket size subtotals ->
    broadcast base offsets -> bucket-local window) — no global sort, no
    single-partition window; only (id, size) pairs move. The payload
    bytes themselves never shuffle here: the layout is computed from
    sizes alone."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text").select(
        "asset_id", F.col("meta.byte_len").cast("bigint").alias("byte_len")
    )
    # Deliberately NOT materialized (mirrors plans/stats.py's
    # range_lead note): the input is a row-local projection of one scan,
    # so the boundary pass just rescans pruned parquet — cheaper at any
    # scale than an O(rows) localCheckpoint of the slice.
    laid = ORD.range_prefix_sum(
        assets, ["asset_id"], ["byte_len"], "asset_id"
    ).select(
        "asset_id",
        "byte_len",
        (F.col("cum_byte_len") - F.col("byte_len")).alias("start_off"),
    )
    placed = laid.select(
        "asset_id",
        "byte_len",
        F.floor(F.col("start_off") / 65536.0).cast("bigint").alias("shard_id"),
    )
    return (
        placed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("byte_len").alias("shard_bytes"),
            F.min("asset_id").alias("first_asset"),
            F.max("asset_id").alias("last_asset"),
        )
        .orderBy("shard_id")
    )


@query(
    "multimodal_shard_roundtrip",
    oracle="""
    WITH sized AS (
      SELECT doc_id AS asset_id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      FROM documents
    ),
    laid AS (
      SELECT asset_id, text, byte_len,
             SUM(byte_len) OVER (ORDER BY asset_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - byte_len AS start_off
      FROM sized
    ),
    sharded AS (
      SELECT asset_id, text, byte_len, start_off,
             CAST(FLOOR(start_off / 65536.0) AS BIGINT) AS shard_id
      FROM laid
    ),
    placed AS (
      SELECT asset_id, text, byte_len, shard_id,
             start_off - MIN(start_off) OVER (PARTITION BY shard_id)
               AS offset_in_shard
      FROM sharded
    ),
    blobs AS (
      SELECT shard_id, string_agg(text, '' ORDER BY asset_id) AS blob
      FROM placed GROUP BY shard_id
    ),
    extracted AS (
      SELECT p.shard_id, p.asset_id,
             md5(SUBSTRING(b.blob, CAST(p.offset_in_shard + 1 AS INTEGER),
                           CAST(p.byte_len AS INTEGER))) = md5(p.text)
               AS roundtrip_ok
      FROM placed p JOIN blobs b USING (shard_id)
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           BOOL_AND(roundtrip_ok) AS all_roundtrip_ok
    FROM extracted
    GROUP BY shard_id
    ORDER BY shard_id
    """,
)
def multimodal_shard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard ROUND-TRIP: assets are physically packed into
    per-shard blobs (binary concat in layout order) and then re-extracted
    by the manifest's (offset, length) — md5 of every extracted slice must
    equal the original payload, per shard. This proves the layout
    arithmetic end-to-end on real bytes, not just the manifest counts
    (multimodal_webdataset_shard_layout's check).

    Scale: packing groups by shard (bounded blob size by construction —
    the 64 KiB shard cap IS the memory bound per group); extraction joins
    the manifest to its shard blob and slices with substring-on-binary,
    all expression-level. The training-loader read path this models does
    the same slice over a ranged GET."""
    docs = load_table(spark, sf_dir, "documents")
    assets = M.attach_binary_payload(docs, "doc_id", "text").select(
        "asset_id",
        "payload",
        F.col("meta.byte_len").cast("bigint").alias("byte_len"),
    )
    # Deliberately NOT materialized: row-local projection of one scan —
    # the boundary pass rescans pruned parquet (and reads only the size
    # column, never the payload), cheaper than checkpointing payloads.
    laid = ORD.range_prefix_sum(
        assets, ["asset_id"], ["byte_len"], "asset_id"
    ).select(
        "asset_id",
        "payload",
        "byte_len",
        (F.col("cum_byte_len") - F.col("byte_len")).alias("start_off"),
    )
    sharded = laid.withColumn(
        "shard_id", F.floor(F.col("start_off") / 65536.0).cast("bigint")
    )
    # in-shard offsets are relative to the shard's FIRST asset: assets are
    # never split, so a boundary-crossing asset pushes the next shard's
    # base PAST shard_id*65536 — anchoring offsets there (the roundtrip's
    # original bug, caught by the md5 check) would slice garbage.
    placed = sharded.withColumn(
        "offset_in_shard",
        F.col("start_off")
        - F.min("start_off").over(
            Window.partitionBy("shard_id").orderBy()
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    blobs = (
        placed.groupBy("shard_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("asset_id", "payload"))
                    ),
                    lambda s: s["payload"],
                ),
                F.lit(b"").cast("binary"),
                lambda acc, x: F.concat(acc, x),
            ).alias("blob")
        )
    )
    extracted = placed.join(blobs, "shard_id").select(
        "shard_id",
        (
            F.md5(
                F.expr(
                    "substring(blob, CAST(offset_in_shard + 1 AS INT), "
                    "CAST(byte_len AS INT))"
                )
            )
            == F.md5(F.col("payload"))
        ).alias("roundtrip_ok"),
    )
    return (
        extracted.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.bool_and("roundtrip_ok").alias("all_roundtrip_ok"),
        )
        .orderBy("shard_id")
    )


@query(
    "multimodal_aspect_ratio_buckets",
    oracle="""
    WITH geo AS (
      SELECT doc_id AS asset_id,
             CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
             CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
      FROM documents
    ),
    bucketed AS (
      SELECT asset_id, width, height,
             CASE WHEN width * 4 < height * 3 THEN 'tall'
                  WHEN width * 3 > height * 4 THEN 'wide'
                  ELSE 'near_square' END AS bucket
      FROM geo
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           ROUND(AVG(CAST(width AS DOUBLE) / height), 6) AS mean_aspect,
           CAST(MIN(width) AS INTEGER) AS min_width,
           CAST(MAX(height) AS INTEGER) AS max_height
    FROM bucketed
    GROUP BY bucket ORDER BY bucket
    """,
)
def multimodal_aspect_ratio_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing (the SDXL/NovelAI training trick): assets
    grouped into tall / near-square / wide bands by integer cross-ratio
    (w·4 < h·3 etc. — no float in the branch) so each training batch can
    resize to ITS bucket's shape instead of center-cropping everything
    square. Geometry comes from the deterministic stub decoder
    (multimodal_decode_stub's width/height law), so the bucketing is
    oracled while the real codec stays honestly stubbed.

    Scale: per-row arithmetic + one rollup over 3 buckets; at training
    scale the bucket id becomes the repartition key so same-shape batches
    co-locate — the same layout idea as the WebDataset sharding."""
    docs = load_table(spark, sf_dir, "documents")
    geo = docs.select(
        F.col("doc_id").alias("asset_id"),
        (F.octet_length(F.col("text").cast("binary")) % 640 + 1).alias(
            "width"
        ),
        (F.octet_length(F.col("text").cast("binary")) % 480 + 1).alias(
            "height"
        ),
    )
    bucket = (
        F.when(F.col("width") * 4 < F.col("height") * 3, "tall")
        .when(F.col("width") * 3 > F.col("height") * 4, "wide")
        .otherwise("near_square")
    )
    return (
        geo.select("asset_id", "width", "height", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.round(
                F.avg(F.col("width").cast("double") / F.col("height")), 6
            ).alias("mean_aspect"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
        .orderBy("bucket")
    )


_PAIR_CLIP_MIN = 0.3
_PAIR_TOK_MIN, _PAIR_TOK_MAX = 5, 512


@query(
    "multimodal_pair_curation",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20
    ),
    assets AS (
      SELECT doc_id, text AS caption,
             md5(text) AS checksum,
             CAST(octet_length(encode(text)) AS INTEGER) AS byte_len
      FROM planted
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY checksum
                                     ORDER BY doc_id) AS rn
        FROM assets
      ) WHERE rn = 1
    ),
    clip_gated AS (
      SELECT * FROM deduped
      WHERE ((('0x' || substring(md5(checksum || caption), 1, 8))::BIGINT
              + 0.5) / 4294967296.0) >= {_PAIR_CLIP_MIN}
    ),
    cap_gated AS (
      SELECT *,
             CAST(byte_len % 640 + 1 AS INTEGER) AS width,
             CAST(byte_len % 480 + 1 AS INTEGER) AS height
      FROM clip_gated
      WHERE len(string_split(TRIM(caption), ' '))
              BETWEEN {_PAIR_TOK_MIN} AND {_PAIR_TOK_MAX}
    ),
    bucketed AS (
      SELECT CASE WHEN CAST(width AS DOUBLE) / height < 0.9 THEN 'portrait'
                  WHEN CAST(width AS DOUBLE) / height <= 1.1 THEN 'square'
                  ELSE 'landscape' END AS bucket
      FROM cap_gated
    )
    SELECT 'stage:planted' AS stage, CAST(COUNT(*) AS BIGINT) AS n
    FROM planted
    UNION ALL SELECT 'stage:payload_deduped', COUNT(*) FROM deduped
    UNION ALL SELECT 'stage:clip_gated', COUNT(*) FROM clip_gated
    UNION ALL SELECT 'stage:caption_gated', COUNT(*) FROM cap_gated
    UNION ALL
    SELECT 'bucket:' || bucket, COUNT(*) FROM bucketed GROUP BY bucket
    ORDER BY stage
    """,
)
def multimodal_pair_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text PAIR curation, the LAION-style funnel, end to end:
    payload-checksum dedup (20 duplicate pairs are PLANTED so the stage
    provably removes something), a stub CLIP-score gate (deterministic
    md5-coin of (payload checksum, caption) standing in for the model —
    production swaps the scorer UDF, the funnel is unchanged), caption
    token-count gates, and aspect-ratio bucketing from the stub decode
    geometry — reported as a funnel (survivors per stage) plus the final
    per-bucket distribution a training loader would consume.

    Scale: every stage is a Catalyst expression or a keyed
    window/groupBy — dedup shuffles on the 16-byte checksum, the gates
    are map-side filters, the funnel counts are map-side-combined
    aggregates; payloads themselves never shuffle (metadata-only
    pipeline until a real codec needs bytes)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.unionByName(
        docs.where(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    assets = planted.select(
        "doc_id",
        F.col("text").alias("caption"),
        F.md5(F.col("text").cast("binary")).alias("checksum"),
        F.length(F.col("text").cast("binary")).cast("int").alias("byte_len"),
    )
    w = Window.partitionBy("checksum").orderBy("doc_id")
    deduped = (
        assets.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    coin = F.conv(
        F.substring(F.md5(F.concat(F.col("checksum"), F.col("caption"))), 1, 8),
        16,
        10,
    ).cast("double")
    clip_gated = deduped.where(
        (coin + F.lit(0.5)) / F.lit(4294967296.0) >= _PAIR_CLIP_MIN
    )
    n_tokens = F.size(F.split(F.trim(F.col("caption")), " "))
    cap_gated = clip_gated.where(
        n_tokens.between(_PAIR_TOK_MIN, _PAIR_TOK_MAX)
    ).select(
        "*",
        (F.col("byte_len") % 640 + 1).cast("int").alias("width"),
        (F.col("byte_len") % 480 + 1).cast("int").alias("height"),
    )
    ratio = F.col("width").cast("double") / F.col("height")
    bucketed = cap_gated.select(
        F.when(ratio < 0.9, "portrait")
        .when(ratio <= 1.1, "square")
        .otherwise("landscape")
        .alias("bucket")
    )

    def _stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )

    funnel = (
        _stage(planted, "stage:planted")
        .unionByName(_stage(deduped, "stage:payload_deduped"))
        .unionByName(_stage(clip_gated, "stage:clip_gated"))
        .unionByName(_stage(cap_gated, "stage:caption_gated"))
    )
    buckets = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).select(F.concat(F.lit("bucket:"), F.col("bucket")).alias("stage"), "n")
    return funnel.unionByName(buckets).orderBy("stage")
