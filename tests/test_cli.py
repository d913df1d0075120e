"""CLI tests: reference-flag surface mapped onto the pipeline."""

from warc2text_spark.cli import build_parser, main
from warc2text_spark.sources.fixtures import fixture_df


def test_parser_defaults():
    args = build_parser().parse_args(["-i", "in", "-o", "out"])
    assert args.files == "url,text"
    assert args.classifier == "heuristic"
    assert args.compress == "gzip"
    assert args.max_record_size == 20


def test_bad_flags():
    assert main(["-i", "x", "-o", "y", "--stdout"]) == 1
    assert main(["-i", "x", "-o", "y", "-f", "url,bogus"]) == 1


def test_end_to_end(spark, tmp_path):
    df, expected = fixture_df(spark)
    inp = str(tmp_path / "in")
    df.write.parquet(inp)
    out = str(tmp_path / "out")
    rc = main(["-i", inp, "-o", out, "-f", "url,text,mime,date",
               "--classifier", "skip",
               "--pdfpass", str(tmp_path / "pdf"),
               "--robotspass", str(tmp_path / "robots"),
               "--compress", "none"], spark=spark)
    assert rc == 0
    got = spark.read.parquet(f"{out}/text")
    kept = {k for k, v in expected.items() if v is not None}
    assert {r.doc_id for r in got.collect()} == kept
    assert set(got.columns) == {"doc_id", "lang", "url", "text", "mime", "date"}
    # K3: side outputs are re-gzipped WARC records
    import glob
    from warc2text_spark.sources.warcio import parse_warc_file
    pdf_files = glob.glob(str(tmp_path / "pdf" / "*.warc.gz"))
    rows = [r for f in pdf_files
            for r in parse_warc_file(open(f, "rb").read(), "pdfpass")]
    assert [r["url"] for r in rows] == ["https://a.b/d.pdf"]


def test_jsonl_output(spark, tmp_path):
    df, expected = fixture_df(spark)
    inp = str(tmp_path / "jin")
    df.write.parquet(inp)
    out = str(tmp_path / "jout")
    rc = main(["-i", inp, "-o", out, "--jsonl", "--classifier", "skip",
               "--compress", "none"], spark=spark)
    assert rc == 0
    import json
    lines = [json.loads(r.value) for r in spark.read.text(f"{out}/jsonl").collect()]
    kept = {k for k, v in expected.items() if v is not None}
    assert {o["f"] for o in lines} == kept
    assert all(list(o)[:8] == ["f", "o", "s", "rs", "u", "c", "ts", "de"]
               for o in lines)


def test_compress_level_and_buffer_flags(spark, tmp_path):
    df, _ = fixture_df(spark)
    inp = str(tmp_path / "cin")
    df.write.parquet(inp)
    out = str(tmp_path / "cout")
    rc = main(["-i", inp, "-o", out, "--classifier", "skip",
               "--compress", "zstd", "--compress-level", "5",
               "--buffer-size", "64", "-s"], spark=spark)
    assert rc == 0
    import glob
    assert glob.glob(f"{out}/text/lang=*/**/*.zstd.parquet", recursive=True)
