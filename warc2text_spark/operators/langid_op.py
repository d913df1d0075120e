"""Kernel 2: batched language identification (mapInArrow).

Reference: the pluggable LanguageDetector stage (src/lang.hh:14-23) invoked
at warcpreprocessor.cc:216 and the per-language demux (record.cc:291-298,
bilangwriter.cc:171-181).  ``detect`` yields {lang: chunk}; here the chunks
come back as an ordered array<struct<lang,chunk>> (sorted by lang — the
reference's unordered_map emission order is nondeterministic, ours is
deterministic by construction) which the caller explodes into per-language
rows for the partitioned write.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.langid import get_detector

_LANG_TYPE = pa.list_(pa.struct([("lang", pa.string()), ("chunk", pa.string())]))


def make_langid_kernel(classifier: str = "heuristic"):
    def kernel(batches):
        detector = get_detector(classifier)
        for batch in batches:
            names = batch.schema.names
            idx = names.index("plaintext")
            texts = batch.column(idx).to_pylist()
            langs = []
            for text in texts:
                chunks = detector.detect(text or "")
                langs.append(sorted(({"lang": k, "chunk": v}
                                     for k, v in chunks.items()),
                                    key=lambda d: d["lang"]))
            arrays = list(batch.columns) + [pa.array(langs, type=_LANG_TYPE)]
            schema = pa.schema(list(batch.schema) + [pa.field("langs", _LANG_TYPE)])
            yield pa.RecordBatch.from_arrays(arrays, schema=schema)

    return kernel


def run_langid(df: DataFrame, classifier: str = "heuristic") -> DataFrame:
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    ddl += ", langs array<struct<lang:string,chunk:string>>"
    return df.mapInArrow(make_langid_kernel(classifier), ddl)


def explode_by_lang(df: DataFrame) -> DataFrame:
    """(record x lang) rows for the per-language demux (A3)."""
    ex = df.withColumn("lc", F.explode("langs")).drop("langs")
    return ex.withColumn("lang", F.col("lc.lang")) \
             .withColumn("chunk", F.col("lc.chunk")).drop("lc")
