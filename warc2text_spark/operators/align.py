"""Bitext document alignment candidates.

Beyond-reference (graft mandate), but squarely in the reference's own
ecosystem: warc2text is the extraction stage of bitextor, whose next step
pairs documents across languages to mine parallel corpora.  The public
first-pass heuristic is URL matching — two pages on the same host whose
paths differ only by a language token (``/en/`` vs ``/fr/``) are candidate
translations (bitextor's documented URL-alignment feature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# a path segment that is a bare language token: 2-letter code with an
# optional region suffix (/en/, /fr/, /pt-br/)
_LANG_SEG = r"/[a-z]{2}(-[a-z]{2})?/"


def bitext_candidates(df: DataFrame, url_col: str = "url",
                      lang_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Candidate translation pairs: same host, same language-stripped
    path, different language labels.  Returns (a_id, b_id, lang_a,
    lang_b, key) with lang_a < lang_b ordering each pair once.

    Scale: one equality self-join on the derived (host | stripped-path)
    key — ids, langs and the key string only; document payloads never
    enter the join.  A viral key (one path mirrored into hundreds of
    languages) is bounded by the language count, not the corpus, so the
    join is skew-safe by construction."""
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    norm = F.regexp_replace(F.col(url_col), _LANG_SEG, "/")
    key = F.concat_ws("|", host, norm)
    base = df.select(F.col(id_col).cast("string").alias("id"),
                     F.col(lang_col).alias("lang"), key.alias("key"))
    a = base.select(F.col("id").alias("a_id"),
                    F.col("lang").alias("lang_a"), "key")
    b = base.select(F.col("id").alias("b_id"),
                    F.col("lang").alias("lang_b"), "key")
    return (a.join(b, "key")
            .filter(F.col("lang_a") < F.col("lang_b"))
            .select("a_id", "b_id", "lang_a", "lang_b", "key"))
