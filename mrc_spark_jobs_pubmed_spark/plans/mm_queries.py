"""Multimodal columns as first-class, oracle-checked queries.

The `documents` table stands in for a media lake: each text is encoded
to an opaque BINARY `content` column (the same shape a real image/audio
blob would travel in — SURVEY.md §2 Part B multimodal), then pushed
through the Arrow-batched `mapInPandas` operators in
`operators/multimodal.py`. Because the stub decode kernel is
deterministic (md5-derived), every query here has an exact DuckDB SQL
oracle: the oracle recomputes the kernel arithmetic from the same bytes,
proving the Spark-side plumbing (schema, batching, row multiplicity)
preserves per-row semantics under any partitioning.

At 100 TB the shape is identical: `content` is a Parquet BINARY column
(columnar, scannable without decode), metadata predicates prune before
any Python crossing, and the only Python boundary is one Arrow batch per
`mapInPandas` task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrc_spark_jobs_pubmed_spark.operators import multimodal as M
from mrc_spark_jobs_pubmed_spark.plans.registry import register
from mrc_spark_jobs_pubmed_spark.sources.catalog import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → opaque-binary media frame (content = utf-8 bytes)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(48).cast("int").alias("height"),
            F.lit(16_000).cast("int").alias("sample_rate"),
            (250 * (F.col("doc_id") % 8 + 1)).cast("int").alias("duration_ms"),
            F.lit("mock").alias("format"),
        ).alias("meta"),
    )


@register(
    "mm_decode_features",
    oracle="""
SELECT doc_id AS media_id,
       16 + CAST('0x' || substr(md5(text), 1, 2) AS INTEGER) AS width,
       16 + CAST('0x' || substr(md5(text), 3, 2) AS INTEGER) AS height,
       octet_length(encode(text)) AS n_bytes,
       array_to_string(
         [printf('%.6f',
                 round(CAST('0x' || substr(md5(text), 2*i-1, 2) AS INTEGER)
                       / 255.0, 6))
          for i in range(1, 9)], '|') AS features
FROM documents
""",
    doc="Media decode + feature extraction through Arrow-batched "
    "mapInPandas; the deterministic stub kernel (md5-derived dims + "
    "8-dim feature vector) is recomputed in SQL by the oracle, so the "
    "whole Python crossing is value-checked end to end. The vector is "
    "emitted as a '|'-joined %.6f scalar at the contract edge (the "
    "driver's pandas canonicalizer cannot sort list cells — r01 ERR).",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = M.decode_features(_media(spark, sf_dir))
    # float32 storage re-canonicalized to 6dp doubles, then one scalar
    return decoded.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.expr(
            "concat_ws('|', transform(features,"
            " x -> format_string('%.6f', round(cast(x AS double), 6))))"
        ).alias("features"),
    )


@register(
    "mm_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id AS media_id, unnest(range(0, doc_id % 8 + 1)) AS k
  FROM documents
)
SELECT media_id,
       CAST(k AS INTEGER) AS frame_idx,
       CAST(k * 250 AS INTEGER) AS ts_ms,
       md5(CAST(media_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS frame_md5
FROM f
""",
    doc="Video frame sampling: one media row expands to duration/250ms "
    "frame rows (UDTF-like row multiplicity through mapInPandas); oracle "
    "rebuilds the expansion with range+unnest and checks frame bytes by "
    "md5 identity.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = M.sample_frames(_media(spark, sf_dir), every_ms=250)
    return frames.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.lower(F.hex("frame")).alias("frame_md5"),
    )


@register(
    "mm_resize_meta",
    oracle="""
SELECT doc_id AS media_id,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0 ELSE 64 END AS n_bytes,
       64 AS width, 48 AS height
FROM documents
""",
    doc="binary→binary resize plumbing: content re-shaped to the target "
    "length (64*48/64+16 = 64 bytes) with meta width/height rewritten; "
    "oracle pins row multiplicity, output length, and meta update.",
)
def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = M.resize_media(_media(spark, sf_dir), width=64, height=48)
    return resized.select(
        "media_id",
        F.length("content").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


# --- webdataset-style shard manifest ----------------------------------------

SHARD_BYTES = 16_384  # target archive size (bytes) per shard


@register(
    "mm_shard_manifest",
    oracle=f"""
WITH samples AS (
  SELECT doc_id, lang,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
placed AS (
  SELECT doc_id, lang, n_bytes,
         sum(n_bytes) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_bytes AS start_off
  FROM samples
)
SELECT lang,
       CAST(start_off // {SHARD_BYTES} AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM placed
GROUP BY lang, start_off // {SHARD_BYTES}
""",
    doc="Webdataset-style shard manifest: the media lake packed into "
    "fixed-byte-budget archives per language stream — sample order is "
    "deterministic (doc_id), each sample's shard is its running byte "
    "offset integer-divided by the budget, and the manifest reports "
    "per-shard sample count, payload bytes, and the [first, last] "
    "sample range a reader needs to seek. This is the layout step "
    "every multimodal training pipeline runs before dataloader "
    "consumption (tar shards of ~uniform size, sequential reads). One "
    "hash exchange on lang for the running-sum window; the shard agg "
    "reuses the same partitioning (shard_id is a function of lang + "
    "offset), so packing is a single-shuffle operation at any corpus "
    "size — per-lang streams are independent, parallelism = languages, "
    "and skewed languages split by adding a salt dimension to the "
    "stream key exactly as corpus_pack_greedy documents.",
)
def mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    samples = docs.select(
        "doc_id",
        "lang",
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = samples.select(
        "doc_id",
        "lang",
        "n_bytes",
        (F.sum("n_bytes").over(w) - F.col("n_bytes")).alias("start_off"),
    )
    return (
        # Exact integer division (`div`), not floor() of a double
        # quotient: doubles lose integer exactness above 2^53, so a /
        # -based bucket id could misplace byte offsets beyond ~9 PB —
        # the oracle's `//` is exact at all magnitudes and so is this.
        placed.withColumn(
            "shard_id", F.expr(f"start_off div {SHARD_BYTES}").cast("long")
        )
        .groupBy("lang", "shard_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "mm_binary_dedup",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, 'image' AS kind,
         md5(text) AS content_hash,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT kind, content_hash,
       count(*) AS n_copies,
       min(media_id) AS canonical_id,
       CAST(min(n_bytes) AS BIGINT) AS bytes_each,
       CAST((count(*) - 1) * min(n_bytes) AS BIGINT) AS bytes_saved
FROM media
GROUP BY kind, content_hash
HAVING count(*) >= 2
""",
    doc="Exact media dedup over the opaque BINARY column: md5 of the "
    "raw bytes (computed on the binary itself, never a decode) groups "
    "identical blobs per modality, reporting copy count, canonical "
    "(min) id, and the bytes a dedup pass reclaims — the first storage "
    "question a 100 TB media lake asks, and the multimodal face of "
    "dedup_exact. The hash runs JVM-side on the columnar BINARY value "
    "(no Python crossing, no decode); one hash-agg shuffle carrying "
    "(hash, 16 bytes of stats) per group — blob bytes never move. "
    "Near-dup composition: the stub decode features "
    "(mm_decode_features) band into the same LSH machinery the text "
    "side uses, a real pHash swapping in behind the identical plan.",
)
def mm_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir)
    return (
        media.select(
            "kind",
            F.md5("content").alias("content_hash"),
            F.octet_length("content").alias("n_bytes"),
            "media_id",
        )
        .groupBy("kind", "content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("media_id").alias("canonical_id"),
            F.min("n_bytes").cast("long").alias("bytes_each"),
            ((F.count("*") - 1) * F.min("n_bytes"))
            .cast("long")
            .alias("bytes_saved"),
        )
        .where(F.col("n_copies") >= 2)
    )


# --- perceptual-hash near-dup over the BINARY column ------------------------

PHASH_BITS = 32
PHASH_MAX_HAM = 1  # 2 bands x 16 bits: recall is EXACT for hamming <= 1


def _phash_sql() -> str:
    from mrc_spark_jobs_pubmed_spark.operators.dedup import _simhash_bit_term

    terms = ", ".join(
        f"sum({_simhash_bit_term(b, 'duckdb')}) AS s{b}"
        for b in range(PHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for b in range(PHASH_BITS)
    )
    return f"""
WITH blocks AS (
  SELECT doc_id AS media_id,
         regexp_extract_all(lower(hex(encode(text))), '.{{32}}') AS arr
  FROM documents
),
chunks AS (
  SELECT media_id,
         unnest(CASE WHEN len(list_distinct(arr)) = 0
                     THEN [CAST(NULL AS VARCHAR)]
                     ELSE list_distinct(arr) END) AS tok
  FROM blocks
),
sig AS (SELECT media_id, {terms} FROM chunks GROUP BY media_id),
ph AS (SELECT media_id, {fp} AS phash FROM sig),
bands AS (
  SELECT media_id, phash, 0 AS band, phash & 65535 AS key FROM ph
  UNION ALL
  SELECT media_id, phash, 1 AS band, (phash >> 16) & 65535 AS key FROM ph
)
SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM bands a
JOIN bands b ON a.band = b.band AND a.key = b.key
            AND a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAM}
"""


@register(
    "mm_phash_neardup",
    oracle=_phash_sql(),
    doc="Perceptual-hash near-duplicate detection over the opaque media "
    "BINARY column: a 32-bit BLOCK-SIMHASH fingerprint built from the "
    "blob's distinct 16-byte blocks (each block votes +-1 per bit via "
    "its md5 — the fuzzy-hash/ssdeep idea done as columnar SQL; a real "
    "DCT pHash swaps in behind the identical banding plan, exactly as "
    "mm_binary_dedup's docstring promises), then 2x16-bit LSH bands "
    "generate candidates and XOR-popcount verifies Hamming <= "
    f"{PHASH_MAX_HAM} — a one-bit corruption, partial truncation, or "
    "re-container of the same media still pairs, which exact md5 "
    "dedup cannot see. Banding at 16 bits makes recall EXACT at this "
    "threshold (<= 1 differing bit leaves one half intact). All "
    "JVM-side expression work on the BINARY value — no decode, no "
    "Python. Scale shape: one explode to distinct blocks + one 32-agg "
    "signature reduce (the dedup_simhash plan), then the band "
    "equi-join; band-key skew concentration is the measured "
    "dedup_simhash_stats profile and the same caveat applies — "
    "verification volume is quadratic in per-key clone density, with "
    "candidate-first composition the production path.",
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    chunks = docs.select(
        F.col("doc_id").alias("media_id"),
        F.explode_outer(
            F.array_distinct(
                F.expr(
                    "regexp_extract_all(lower(hex(encode(text, 'utf-8'))),"
                    " '.{32}', 0)"
                )
            )
        ).alias("tok"),
    )
    valued = chunks.select(
        "media_id",
        F.expr("CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT)").alias(
            "v"
        ),
    )
    aggs = [
        F.sum(
            F.expr(
                f"CASE WHEN (shiftright(v, {(7 - b // 4) * 4 + b % 4}) & 1)"
                " = 1 THEN 1 ELSE -1 END"
            )
        ).alias(f"s{b}")
        for b in range(PHASH_BITS)
    ]
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for b in range(PHASH_BITS)
    )
    ph = (
        valued.groupBy("media_id")
        .agg(*aggs)
        .select("media_id", F.expr(fp).alias("phash"))
    )
    bands = ph.select(
        "media_id",
        "phash",
        F.lit(0).alias("band"),
        F.expr("phash & 65535").alias("key"),
    ).unionByName(
        ph.select(
            "media_id",
            "phash",
            F.lit(1).alias("band"),
            F.expr("shiftright(phash, 16) & 65535").alias("key"),
        )
    )
    a = bands.select(
        F.col("media_id").alias("media_a"),
        F.col("phash").alias("ph_a"),
        "band",
        "key",
    )
    b = bands.select(
        F.col("media_id").alias("media_b"),
        F.col("phash").alias("ph_b"),
        "band",
        "key",
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("media_a") < F.col("media_b"))
        .select(
            "media_a",
            "media_b",
            F.expr("CAST(bit_count(ph_a ^ ph_b) AS LONG)").alias("hamming"),
        )
        .where(F.col("hamming") <= PHASH_MAX_HAM)
        .distinct()
    )


# --- scene-cut detection over sampled frames --------------------------------

SCENE_CUT_HAM = 20  # 32-bit frame-hash hamming above this = scene cut


@register(
    "mm_scene_detection",
    oracle=f"""
WITH f AS (
  SELECT doc_id AS media_id, unnest(range(0, doc_id % 8 + 1)) AS k
  FROM documents
),
ph AS (
  SELECT media_id, k,
         CAST('0x' || substr(md5(CAST(media_id AS VARCHAR) || ':'
                                 || CAST(k AS VARCHAR)), 1, 8)
              AS BIGINT) AS phash
  FROM f
),
cuts AS (
  SELECT media_id, k, phash,
         lag(phash) OVER (PARTITION BY media_id ORDER BY k) AS prev
  FROM ph
)
SELECT media_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(1 + sum(CASE WHEN prev IS NOT NULL
                          AND bit_count(xor(phash, prev)) > {SCENE_CUT_HAM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_scenes,
       CAST(max(CASE WHEN prev IS NULL THEN 0
                     ELSE bit_count(xor(phash, prev)) END) AS BIGINT)
         AS max_cut_hamming
FROM cuts
GROUP BY media_id
""",
    doc="Scene-cut detection: consecutive sampled frames are fingerprinted "
    "(32-bit hash of the frame bytes — the stub stands in for a DCT "
    "frame pHash, exactly as mm_phash_neardup documents) and a cut is "
    f"declared where the hamming distance jumps above {SCENE_CUT_HAM} "
    "of 32 bits — the shot-boundary primitive video curation runs "
    "before per-scene sampling or captioning. Built ON the "
    "mm_frame_sample expansion (same mapInPandas row-multiplicity "
    "contract), then one lag window per media ordered by frame index "
    "and a per-media rollup: the whole scene pass adds ONE shuffle on "
    "media_id over the frame stream, frames never leave the executor "
    "as raw bytes (fingerprinted in the same projection). Output is "
    "per-media frame/scene counts and the strongest cut.",
)
def mm_scene_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    frames = M.sample_frames(_media(spark, sf_dir), every_ms=250)
    ph = frames.select(
        "media_id",
        "frame_idx",
        F.expr(
            "CAST(conv(substr(lower(hex(frame)), 1, 8), 16, 10) AS BIGINT)"
        ).alias("phash"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    cuts = ph.withColumn("prev", F.lag("phash").over(w))
    ham = F.expr("bit_count(phash ^ prev)")
    return cuts.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (ham > SCENE_CUT_HAM), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("n_scenes"),
        F.max(
            F.when(F.col("prev").isNull(), 0).otherwise(ham)
        )
        .cast("long")
        .alias("max_cut_hamming"),
    )


# --- aspect-ratio bucketing (training-batch geometry assignment) ------------

# (bw, bh) target shapes, portrait -> landscape; fixed-point aspect
# ratios are 1e6*bw div bh = 250000, 500000, 1000000, 2000000, 4000000
AR_BUCKETS = [(64, 256), (96, 192), (128, 128), (192, 96), (256, 64)]


def _ar_bucket_key_sql(w: str, h: str) -> str:
    """argmin bucket as least(diff*8+idx)%8 — exact, tie -> lower idx."""
    terms = ", ".join(
        f"abs(1000000 * {w} // {h} - {1000000 * bw // bh}) * 8 + {i}"
        for i, (bw, bh) in enumerate(AR_BUCKETS)
    )
    return f"(least({terms}) % 8)"


@register(
    "mm_aspect_bucket",
    oracle=f"""
WITH dims AS (
  SELECT doc_id AS media_id,
         16 + CAST('0x' || substr(md5(text), 1, 2) AS INTEGER) AS w,
         16 + CAST('0x' || substr(md5(text), 3, 2) AS INTEGER) AS h
  FROM documents
),
assigned AS (
  SELECT media_id, w, h, {_ar_bucket_key_sql('w', 'h')} AS bidx
  FROM dims
)
SELECT bidx AS bucket_idx,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(CASE WHEN w * h <
                CASE bidx {' '.join(f'WHEN {i} THEN {bw * bh}' for i, (bw, bh) in enumerate(AR_BUCKETS))} END
              THEN 1 ELSE 0 END) AS BIGINT) AS n_upscale,
       CAST(sum(1000000 * w // h) // count(*) AS BIGINT) AS avg_ar_u6,
       CAST(min(1000000 * w // h) AS BIGINT) AS min_ar_u6,
       CAST(max(1000000 * w // h) AS BIGINT) AS max_ar_u6
FROM assigned
GROUP BY bidx
""",
    doc="Aspect-ratio bucketing for image-training batch assembly "
    "(SDXL-style): every decoded image goes to the fixed target shape "
    "whose aspect ratio is nearest its own, so training batches crop "
    "minimally and pad never. Nearest is computed in exact fixed-point "
    "(1e6-unit ratios) with the argmin folded into ONE least() over "
    "diff*8+idx — no window, no join, ties break to the lower bucket "
    "deterministically. Dims come through the real Arrow decode "
    "crossing (operators/multimodal.decode_features), so the Python "
    "plumbing is exercised; the oracle recomputes the kernel "
    "arithmetic from the same bytes. Scale shape: decode is one "
    "mapInPandas pass (zero shuffle), assignment is a codegen "
    "projection, and the report is one hash-agg on <=5 keys with "
    "map-side partials — n_upscale tells you which buckets force "
    "lossy upsampling at corpus scale.",
)
def mm_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = M.decode_features(_media(spark, sf_dir)).select(
        "media_id", "width", "height"
    )
    terms = ", ".join(
        f"abs(1000000 * width div height - {1000000 * bw // bh}) * 8 + {i}"
        for i, (bw, bh) in enumerate(AR_BUCKETS)
    )
    area_case = " ".join(
        f"WHEN {i} THEN {bw * bh}" for i, (bw, bh) in enumerate(AR_BUCKETS)
    )
    assigned = decoded.select(
        "media_id",
        F.col("width").alias("w"),
        F.col("height").alias("h"),
        F.expr(f"least({terms}) % 8").alias("bucket_idx"),
        F.expr("1000000 * width div height").alias("ar_u6"),
    )
    return assigned.groupBy("bucket_idx").agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum(
            F.expr(f"CASE WHEN w * h < CASE bucket_idx {area_case} END THEN 1 ELSE 0 END")
        )
        .cast("long")
        .alias("n_upscale"),
        F.expr("CAST(sum(ar_u6) div count(*) AS LONG)").alias("avg_ar_u6"),
        F.min("ar_u6").cast("long").alias("min_ar_u6"),
        F.max("ar_u6").cast("long").alias("max_ar_u6"),
    )


# --- multimodal token-budget accounting --------------------------------------

PATCH = 14  # ViT-style patch edge; tokens = ceil(w/14) * ceil(h/14)
MS_PER_AUDIO_TOKEN = 80  # 12.5 audio tokens per second


@register(
    "mm_token_budget",
    oracle=f"""
WITH decoded AS (
  SELECT doc_id,
         16 + CAST('0x' || substr(md5(text), 1, 2) AS INTEGER) AS w,
         16 + CAST('0x' || substr(md5(text), 3, 2) AS INTEGER) AS h,
         250 * (doc_id % 8 + 1) AS duration_ms
  FROM documents
),
grid AS (
  SELECT (w + {PATCH - 1}) // {PATCH} AS gw,
         (h + {PATCH - 1}) // {PATCH} AS gh,
         duration_ms
  FROM decoded
)
SELECT CAST(gw AS BIGINT) AS gw,
       CAST(gh AS BIGINT) AS gh,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(gw * gh) AS BIGINT) AS vision_tokens,
       CAST(sum(duration_ms // {MS_PER_AUDIO_TOKEN}) AS BIGINT)
         AS audio_tokens,
       CAST(sum(gw * gh) + sum(duration_ms // {MS_PER_AUDIO_TOKEN})
         AS BIGINT) AS total_tokens
FROM grid
GROUP BY gw, gh
ORDER BY gw, gh
""",
    doc="Multimodal token-budget accounting: each media item's decoded "
    f"resolution (the md5-derived stub decode of mm_decode_features) "
    f"maps to a ViT patch grid (ceil(w/{PATCH}) x ceil(h/{PATCH}) "
    "vision tokens) and its duration to audio tokens "
    f"({MS_PER_AUDIO_TOKEN} ms each), aggregated per patch-grid bucket "
    "— the compute-budget table a multimodal trainer needs to size "
    "batches and balance resolution buckets (the token-cost companion "
    "to mm_aspect_bucket's shape binning). All integer: ceil division "
    "is (x+k-1) div k on both engines, durations are exact ms. Scale "
    "shape: per-row codegen arithmetic + one bounded-domain hash-agg "
    "(grid dims <= 20x20) with map-side partials — one corpus scan, "
    "one tiny exchange; the real decode stays behind the same "
    "metadata-first contract (never decode to count tokens).",
)
def mm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir)
    h = F.md5(F.decode(F.col("content"), "utf-8"))
    decoded = media.select(
        (16 + F.conv(F.substring(h, 1, 2), 16, 10).cast("int")).alias("w"),
        (16 + F.conv(F.substring(h, 3, 2), 16, 10).cast("int")).alias("h"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
    grid = decoded.select(
        F.expr(f"CAST((w + {PATCH - 1}) div {PATCH} AS BIGINT)").alias("gw"),
        F.expr(f"CAST((h + {PATCH - 1}) div {PATCH} AS BIGINT)").alias("gh"),
        "duration_ms",
    )
    return (
        grid.groupBy("gw", "gh")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("gw") * F.col("gh")).cast("long").alias("vision_tokens"),
            F.sum(F.expr(f"duration_ms div {MS_PER_AUDIO_TOKEN}"))
            .cast("long")
            .alias("audio_tokens"),
        )
        .select(
            "gw",
            "gh",
            "n_items",
            "vision_tokens",
            "audio_tokens",
            (F.col("vision_tokens") + F.col("audio_tokens")).alias("total_tokens"),
        )
        .orderBy("gw", "gh")
    )
