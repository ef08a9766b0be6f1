"""Round-9 additions (registered AFTER the live r9 window and the
pinned _ROUND10_WINDOW; rotation slot round 11+ — CLAUDE.md
new-query discipline: each proven local-green at sf0.001 + sf0.01
incl. --plain before landing).

- ``dedup_image_phash`` — perceptual image near-dedup (VERDICT r08
  item 7): the IMAGE rung of the dedup ladder, next to text
  MinHash/SimHash and embedding cosine. Real BMP synth → real
  container decode (bottom-up rows + stride padding) → integer
  luminance → 9×8 grid → 64-bit dHash as four 16-bit bands →
  Hamming-band candidate join → Hamming ≤ 3 cut. EXACT cross-engine
  twin (the dedup_simhash_portable convention): every stage is
  integer arithmetic, and at max_hamming = 3 < 4 bands the banded
  pair set EQUALS the all-pairs thresholded set by pigeonhole, so
  the oracle replays the simple all-pairs form over the bounded
  slice while the engine runs the banded production shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators import multimodal as mm
from .registry import query
from .staged_r06 import _cms_oracle_bucket_sql


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return catalog.load(spark, sf_dir, table)


_PH_SLICE = 400  # doc_id < 400: bounds the oracle's all-pairs replay
_PH_MAXHAM = 3  # < 4 bands => pigeonhole makes banding lossless


def _dhash_oracle_sql() -> str:
    """DuckDB replay of the full dHash pipeline: the same portable
    byte fill (base on the GROUP key + sparse per-doc +128 flips, all
    on the prime 251 grid), the same bottom-up/stride byte addressing
    of the sampled 9×8 luminance grid, the same integer luminance and
    gradient-sign bits, the same four 16-bit band integers, and the
    all-pairs Hamming ≤ 3 cut (== the banded engine result by
    pigeonhole: ≤ 3 differing bits across 4 bands always leave one
    band identical, and both sides emit only pairs ≤ 3)."""
    base = _cms_oracle_bucket_sql(
        f"(doc_id % {mm.DHASH_GROUPS}) * 1024 + jj",
        mm.DHASH_SEED_BASE,
        mm.DHASH_BYTE_MOD,
    )
    flip = _cms_oracle_bucket_sql(
        "doc_id * 1024 + jj", mm.DHASH_SEED_FLIP, mm.DHASH_FLIPMOD
    )
    return f"""
    WITH d AS (
      SELECT doc_id FROM documents WHERE doc_id < {_PH_SLICE}
    ), grid AS (
      SELECT d.doc_id, yy.i AS yy, xx.i AS xx, ch.i AS ch,
             ({mm.DHASH_H - 1} - 2 * yy.i) * {mm.DHASH_STRIDE}
               + 6 * xx.i + ch.i AS jj
      FROM d,
           LATERAL unnest(range(8)) AS yy(i),
           LATERAL unnest(range(9)) AS xx(i),
           LATERAL unnest(range(3)) AS ch(i)
    ), byte AS (
      SELECT doc_id, yy, xx, ch,
             (({base})
              + CASE WHEN ({flip}) = 0 THEN 128 ELSE 0 END)
             % {mm.DHASH_BYTE_MOD} AS v
      FROM grid
    ), lum AS (
      -- BMP byte order is B,G,R: luminance (r + 2g + b) >> 2
      SELECT doc_id, yy, xx,
             CAST(SUM(CASE ch WHEN 0 THEN v WHEN 1 THEN 2 * v
                      ELSE v END) // 4 AS BIGINT) AS gv
      FROM byte GROUP BY doc_id, yy, xx
    ), bits AS (
      SELECT doc_id, yy, xx,
             CASE WHEN LEAD(gv) OVER (
               PARTITION BY doc_id, yy ORDER BY xx) > gv
             THEN 1 ELSE 0 END AS bit
      FROM lum
    ), sigs AS (
      SELECT doc_id,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 0
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b0,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 1
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b1,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 2
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b2,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 3
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b3
      FROM bits WHERE xx < 8 GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
              AS INT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
        <= {_PH_MAXHAM}
    """


@query("dedup_image_phash", oracle=_dhash_oracle_sql())
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dedup via dHash + Hamming-band bucketing
    (VERDICT r08 item 7): each doc's 24-bit BMP is synthesized with a
    GROUP-keyed fill + sparse per-doc perturbation (planted
    near-duplicates), decoded back through the real container parse
    (bottom-up row order + 4-byte stride, operators/multimodal.py),
    reduced to the 9×8 integer-luminance grid, and hashed to 64
    gradient-sign bits held as four 16-bit band integers. Candidates
    come from the SimHash-style band join (pairs agreeing on ≥1 band
    — Hamming ≤ 3 is GUARANTEED caught by pigeonhole over 4 bands),
    then the exact Hamming cut verifies. dHash over DCT-pHash is
    deliberate: integer end-to-end, so the oracle replays every stage
    exactly (a DCT's float cosines would put sign bits on libm ULPs);
    fixture geometry: within-group Hamming ≤ 5 (1729/1800 pairs ≤ 3),
    cross-group minimum 6 — an integer gap above the cut, test-pinned.

    Scale: signatures are one Arrow mapInPandas scan (production
    would decode real bytes the same way); the band join shards by
    16-bit band value exactly like MinHash LSH band buckets — never
    all-pairs. The all-pairs form exists only as the oracle spec over
    the bounded slice."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < _PH_SLICE)
    sigs = mm.image_dhash_signatures(d)
    chunks = sigs.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("chunk", "cval"),
    )
    a = chunks.select(
        "chunk",
        "cval",
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{c}").alias(f"a{c}") for c in range(4)],
    )
    b = chunks.select(
        "chunk",
        "cval",
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{c}").alias(f"bb{c}") for c in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{c}").bitwiseXOR(F.col(f"bb{c}")))
        for c in range(4)
    )
    return (
        a.join(b, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= _PH_MAXHAM)
        .distinct()
    )
