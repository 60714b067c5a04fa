"""Synthesize an sf1.0-scale dataset (10× sf0.1) for the scale smoke.

The driver ships sf{0.001,0.01,0.1}; the 100×-design claims in
SCALE.md need at least one measured 10× point (round-4 verdict ask
#4).  Each table is the union of ``FACTOR`` copies of sf0.1 with
per-copy transforms chosen so the DATA DISTRIBUTION scales the way a
real 10× corpus would — bigger, not pathological:

* integer keys shift by ``copy * (max_key + 1)`` consistently across
  fact and dim tables, so intra-copy joins stay valid and cross-copy
  keys never collide;
* ``documents.text`` gets a per-copy word suffix (``_c3``): shingles
  are copy-disjoint, so near-dup structure replicates 10× instead of
  every doc gaining 9 cross-copy twins (which would grow LSH pair
  output ~100× — a synthesis artifact, not scale);
* ``part.p_brand`` gets a per-copy suffix: ER blocking keys replicate
  instead of inflating 10× (pairs-within-block is quadratic in block
  size);
* ``embeddings.embedding`` is circularly shifted by ``2 * copy``
  positions — an orthogonal transform, so within-copy geometry
  (distances, cosines, cluster structure) is EXACTLY preserved while
  cross-copy vectors decorrelate;
* region/nation stay as-is (dimension tables a 10× corpus shares).

Usage: python tools/make_sf1.py [src_dir] [out_dir] [factor] [tag]
Defaults: /root/testdata/sf0.1 → <repo>/.scale/sf1 ×10, tag "c".

CHAINING to a second decade (sf1 → sf10) requires a DIFFERENT ``tag``
(e.g. "d") and relies on two round-7 fixes, both found by the sf10
spot sweep:

* text/brand suffixes must not collide across decades: with one tag,
  copy 0 of the second decade × copy a of the first yields the same
  suffix chain as copy a × copy 0 (``w_ca``) — ~9% exact-twin
  documents, a synthesis artifact that inflates every dedup pair
  count.  Distinct tags (``w_ca_db``) make chains injective.
* circular shifts alone CANNOT decorrelate 100 copies of a 64-dim
  vector (pigeonhole: only 64 rotations exist), so chained decades
  produced exact-twin embeddings whenever shift sums collided mod 64.
  Each copy now ALSO applies a per-copy deterministic ±1 sign mask
  (SHA-256-derived, still an orthogonal transform — within-copy
  geometry exact) so (mask, rotation) pairs never repeat.
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

FACTOR = 10

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# table -> columns that shift by copy * (max_of_that_key_family + 1).
# Key families share the stride so e.g. o_custkey and c_custkey stay
# consistent within a copy.
KEY_FAMILIES = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}


def _strides(spark: SparkSession, src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        mx = 0
        for table, col in cols:
            df = spark.read.parquet(f"{src}/{table}.parquet")
            v = df.agg(F.max(col)).first()[0]
            mx = max(mx, int(v or 0))
        out[fam] = mx + 1
    return out


def _sign_mask(tag: str, i: int, dim: int = 64) -> list[int]:
    """Per-copy deterministic ±1 mask (an orthogonal reflection):
    SHA-256(tag:i) bits → ±1 per component.  Copy 0 keeps the
    identity so the first copy is always the untouched source."""
    import hashlib

    if i == 0:
        return [1] * dim
    digest = hashlib.sha256(f"{tag}:{i}".encode()).digest()
    return [
        1 - 2 * ((digest[k // 8] >> (k % 8)) & 1) for k in range(dim)
    ]


def _copy(
    table: str,
    df: DataFrame,
    i: int,
    strides: dict[str, int],
    tag: str = "c",
) -> DataFrame:
    out = df
    for fam, cols in KEY_FAMILIES.items():
        for t, col in cols:
            if t == table:
                out = out.withColumn(
                    col, F.col(col) + F.lit(i * strides[fam])
                )
    if table == "documents" and i > 0:
        # Per-copy vocabulary: word_c3 — disjoint shingles per copy.
        # The tag must differ per chained decade or suffix chains
        # collide (w + "_c3" == w_c3) and create exact-twin documents.
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(f"_{tag}{i}")),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "part" and i > 0:
        out = out.withColumn(
            "p_brand", F.concat(F.col("p_brand"), F.lit(f"_{tag}{i}"))
        )
    if table == "embeddings" and i > 0:
        # Circular shift + per-copy ±1 sign mask: BOTH are orthogonal
        # (within-copy geometry exact); the mask is what keeps chained
        # decades twin-free — 64 rotations alone cannot decorrelate
        # 100 copies (pigeonhole), measured as exact-twin vectors and
        # a quadratic pair blow-up in the first sf10 spot sweep.
        s = (2 * i) % 64
        emb = F.col("embedding")
        if s:
            emb = F.concat(
                F.slice("embedding", s + 1, 64 - s),
                F.slice("embedding", 1, s),
            )
        mask = _sign_mask(tag, i)
        # Mask literals carry the embedding's own element type so the
        # multiply never widens array<float> to array<double> (a
        # silent schema drift every downstream query would inherit).
        elem_t = df.schema["embedding"].dataType.elementType.simpleString()
        mask_arr = F.array(
            *[F.lit(float(m)).cast(elem_t) for m in mask]
        )
        out = out.withColumn(
            "embedding", F.zip_with(emb, mask_arr, lambda x, m: x * m)
        )
    return out


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".scale", "sf1")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else FACTOR
    tag = sys.argv[4] if len(sys.argv) > 4 else "c"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides(spark, src)
    for table in TABLES:
        dst = f"{out_dir}/{table}.parquet"
        if table in ("region", "nation"):
            shutil.copyfile(f"{src}/{table}.parquet", dst)
            continue
        df = spark.read.parquet(f"{src}/{table}.parquet")
        copies = [
            _copy(table, df, i, strides, tag) for i in range(factor)
        ]
        union = copies[0]
        for c in copies[1:]:
            union = union.unionByName(c)
        # Single file per table, like the driver's testdata layout
        # (queries read the path as a file, not a directory).
        tmp = f"{out_dir}/.tmp_{table}"
        union.coalesce(4).write.mode("overwrite").parquet(tmp)
        import glob

        parts = sorted(glob.glob(f"{tmp}/part-*.parquet"))
        if len(parts) == 1:
            shutil.move(parts[0], dst)
        else:
            # Concatenate via pyarrow to keep one file per table.
            import pyarrow.parquet as pq

            writer = None
            for p in parts:
                t = pq.read_table(p)
                if writer is None:
                    writer = pq.ParquetWriter(dst, t.schema)
                writer.write_table(t)
            if writer:
                writer.close()
        shutil.rmtree(tmp)
        n = spark.read.parquet(dst).count()
        print(f"{table}: {n} rows -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
