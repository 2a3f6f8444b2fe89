"""CSV / ORC / parquet / text landing-source tests (sources/files.py):
schema infer-once persistence, streaming exactly-once over CSV, and
columnar round-trips."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from iot_simulator_datalake_spark.sources.files import (
    infer_csv_schema, read_csv_batch, read_csv_stream, read_file_batch,
    read_file_stream, read_text_batch)
from iot_simulator_datalake_spark.streaming.runner import (
    materialize_streaming_table)


def _write_csv_wave(landing, name: str, rows):
    lines = ["device_id,value"] + [f"{d},{v}" for d, v in rows]
    (landing / name).write_text("\n".join(lines))


def test_csv_schema_inferred_once_and_persisted(spark, tmp_path):
    landing = tmp_path / "csv_landing"
    landing.mkdir()
    _write_csv_wave(landing, "a.csv", [("dev-1", 1.5), ("dev-2", 2.0)])
    store = tmp_path / "schema.json"
    s1 = infer_csv_schema(spark, landing, store)
    assert [f.name for f in s1.fields] == ["device_id", "value"]
    assert store.exists()
    # second call returns the stored contract without re-inferring,
    # even if later files would infer differently
    _write_csv_wave(landing, "b.csv", [("dev-3", "not-a-number")])
    s2 = infer_csv_schema(spark, landing, store)
    assert s2 == s1
    # and the persisted JSON is the schema itself
    assert s1 == type(s1).fromJson(json.loads(store.read_text()))


def test_csv_batch_with_explicit_schema_skips_inference(spark, tmp_path):
    landing = tmp_path / "csv2"
    landing.mkdir()
    _write_csv_wave(landing, "a.csv", [("dev-1", 1.5)])
    store = tmp_path / "s.json"
    schema = infer_csv_schema(spark, landing, store)
    df = read_csv_batch(spark, landing, schema=schema)
    assert df.schema == schema
    assert df.count() == 1


def test_csv_stream_two_waves_exactly_once(spark, tmp_path):
    landing = tmp_path / "csv_stream"
    landing.mkdir()
    store = tmp_path / "schema.json"
    out = str(tmp_path / "out")
    _write_csv_wave(landing, "w1.csv", [("dev-1", 1.0), ("dev-2", 2.0)])

    def run():
        df = read_csv_stream(spark, landing, store)
        materialize_streaming_table(spark, df, path=tmp_path / "out",
                                    checkpoint=tmp_path / "ckpt")

    run()
    assert spark.read.parquet(out).count() == 2
    # wave 2 appends only the new file's rows; re-run is a no-op
    _write_csv_wave(landing, "w2.csv", [("dev-3", 3.0)])
    run()
    run()
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert got.agg(F.count_distinct("device_id")).first()[0] == 3


def test_orc_round_trip_and_stream(spark, tmp_path):
    src = spark.range(10).withColumn("k", F.col("id") % 3)
    p = str(tmp_path / "orc_dir")
    src.write.format("orc").save(p)
    back = read_file_batch(spark, p, "orc")
    assert back.count() == 10
    assert dict(back.dtypes) == {"id": "bigint", "k": "bigint"}
    # streaming read over the same dir (schema snapshotted from footers)
    stream = read_file_stream(spark, p, "orc")
    got = materialize_streaming_table(spark, stream,
                                      path=tmp_path / "out_orc",
                                      checkpoint=tmp_path / "ckpt_orc")
    assert got.count() == 10


def test_text_source_line_and_whole_file(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two")
    (d / "b.txt").write_text("solo")
    by_line = read_text_batch(spark, d)
    assert by_line.count() == 3
    by_file = read_text_batch(spark, d, whole_file=True)
    assert by_file.count() == 2
    assert by_file.where(F.col("value").contains("line two")).count() == 1


def test_csv_schema_evolve_merges_new_fields(spark, tmp_path):
    """ST6 for CSV via the shared infer-persist core: evolve=True
    merges newly-appearing columns into the stored contract (the CSV
    side previously lacked the evolution path entirely)."""
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.csv").write_text("id,v\n1,2\n")
    store = tmp_path / "schema.json"
    s1 = infer_csv_schema(spark, land, store)
    assert [f.name for f in s1.fields] == ["id", "v"]
    (land / "b.csv").write_text("id,v,extra\n3,4,x\n")
    # without evolve: stored contract verbatim
    assert [f.name for f in infer_csv_schema(spark, land, store).fields] \
        == ["id", "v"]
    s2 = infer_csv_schema(spark, land, store, evolve=True)
    assert [f.name for f in s2.fields] == ["id", "v", "extra"]


def test_streaming_table_empty_input_is_clean_noop(spark, tmp_path):
    """Zero-input first run: no micro-batch writes parquet, so the
    result must be an empty frame with the stream's schema — not an
    AnalysisException from schema inference on the empty dir."""
    land = tmp_path / "land"
    land.mkdir()
    schema = "id long, v double"
    stream = spark.readStream.schema(schema).parquet(str(land))
    out = materialize_streaming_table(
        spark=spark, stream_df=stream,
        path=tmp_path / "tbl", checkpoint=tmp_path / "ckpt")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "v"]


def test_csv_header_validation_catches_reordered_columns(spark, tmp_path):
    """enforceSchema=false: a producer file whose header reorders
    columns must FAIL loudly (positional application would silently
    transpose values between columns — the evolve-merge appends new
    fields at the END, so order mismatches are expected in the wild)."""
    from iot_simulator_datalake_spark.sources.files import (
        infer_csv_schema, read_csv_batch)
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.csv").write_text("id,v\n1,10\n")
    schema = infer_csv_schema(spark, land, tmp_path / "store.json")
    (land / "b.csv").write_text("id,extra,v\n2,99,20\n")
    import pytest
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception):
        read_csv_batch(spark, land, schema=schema).collect()


def test_csv_stream_evolve_flag(spark, tmp_path):
    """read_csv_stream must expose the shared core's ST6 evolve path
    (API parity with read_json_stream)."""
    from iot_simulator_datalake_spark.sources.files import read_csv_stream
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.csv").write_text("id,v\n1,10\n")
    store = tmp_path / "store.json"
    s1 = read_csv_stream(spark, land, store).schema
    assert [f.name for f in s1.fields] == ["id", "v"]
    (land / "b.csv").write_text("id,v,extra\n2,20,hi\n")
    s2 = read_csv_stream(spark, land, store, evolve=True).schema
    assert [f.name for f in s2.fields] == ["id", "v", "extra"]


def test_evolve_samples_newest_files_past_sample_cap(spark, tmp_path):
    """Schema evolution must see fields that only exist in files
    sorting AFTER the sample cap: a head-only sample re-inferred the
    same old files forever once the landing dir outgrew sample_files,
    silently no-opping evolve=True."""
    from iot_simulator_datalake_spark.sources.json_source import (
        infer_and_persist_schema)
    landing = tmp_path / "json_landing"
    landing.mkdir()
    for i in range(8):
        (landing / f"part-{i:05d}.json").write_text(
            json.dumps({"device_id": f"d{i}", "value": 1.0}))
    store = tmp_path / "schema.json"
    s1 = infer_and_persist_schema(spark, landing, store, sample_files=4)
    assert "new_field" not in s1.fieldNames()
    # a NEW field lands in a file that sorts after the 4-file sample
    (landing / "part-00099.json").write_text(
        json.dumps({"device_id": "d99", "value": 2.0, "new_field": "x"}))
    s2 = infer_and_persist_schema(spark, landing, store,
                                  sample_files=4, evolve=True)
    assert "new_field" in s2.fieldNames()


def test_inference_glob_miss_stays_bounded(spark, tmp_path):
    """A landing dir whose files miss the format glob (.jsonl) must
    fall back to a bounded file listing, not an unbounded whole-dir
    read — and still infer a usable schema."""
    from iot_simulator_datalake_spark.sources.json_source import (
        infer_and_persist_schema)
    landing = tmp_path / "jsonl_landing"
    landing.mkdir()
    (landing / "a.jsonl").write_text(
        json.dumps({"device_id": "d1", "value": 1.5}))
    store = tmp_path / "schema.json"
    s = infer_and_persist_schema(spark, landing, store)
    assert set(s.fieldNames()) == {"device_id", "value"}


def test_partitioned_materialize_schema_matches_stream(spark, tmp_path):
    """With partition_by, the parquet read-back reorders partition
    columns last and re-types them via partition inference; the
    returned frame must keep the STREAM's column order and types on
    both the empty and non-empty paths."""
    landing = tmp_path / "csv_landing_p"
    landing.mkdir()
    _write_csv_wave(landing, "a.csv", [("20240101", 1.5),
                                       ("20240102", 2.0)])
    store = tmp_path / "schema_p.json"
    stream = read_csv_stream(spark, landing, store)
    out = materialize_streaming_table(
        spark, stream, path=tmp_path / "out_p",
        checkpoint=tmp_path / "ckpt_p",
        partition_by=("device_id",))
    # device_id is a string like '20240101' — partition inference
    # would surface it as an int and move it last without the fix
    assert out.schema == stream.schema
    (tmp_path / "csv_landing_empty").mkdir()
    empty_stream = (spark.readStream.schema(stream.schema)
                    .option("header", "true")
                    .csv(str(tmp_path / "csv_landing_empty")))
    empty = materialize_streaming_table(
        spark, empty_stream,
        path=tmp_path / "out_e", checkpoint=tmp_path / "ckpt_e",
        partition_by=("device_id",))
    assert empty.schema == out.schema


def test_partition_leading_zero_string_value_preserved(spark, tmp_path):
    """ADVICE r8: the partitioned read-back must not lossy-parse a
    numeric-looking string partition value — '0123' inferred as int 123
    then cast back to string yields '123'.  Reading with the stream's
    schema parses the directory value directly as string."""
    from iot_simulator_datalake_spark.sources.json_source import (
        read_json_stream)
    landing = tmp_path / "json_landing_lz"
    landing.mkdir()
    (landing / "a.json").write_text(
        json.dumps({"device_id": "0123", "value": 1.5}) + "\n"
        + json.dumps({"device_id": "1.50", "value": 2.0}))
    store = tmp_path / "schema_lz.json"
    stream = read_json_stream(spark, landing, store)
    assert dict((f.name, f.dataType.simpleString())
                for f in stream.schema.fields)["device_id"] == "string"
    out = materialize_streaming_table(
        spark, stream, path=tmp_path / "out_lz",
        checkpoint=tmp_path / "ckpt_lz",
        partition_by=("device_id",))
    vals = sorted(r.device_id for r in out.select("device_id").collect())
    assert vals == ["0123", "1.50"]


def test_inference_sample_cap_degenerate_zero_stays_bounded(
        spark, tmp_path, monkeypatch):
    """ADVICE r8: sample_files=0 made the tail slice [-0:] select the
    ENTIRE listing — the exact unbounded scan the contract forbids.
    The clamp must keep the sample to ≥1 but ≤ a bounded handful."""
    from iot_simulator_datalake_spark.sources import json_source

    landing = tmp_path / "json_landing_deg"
    landing.mkdir()
    for i in range(10):
        (landing / f"p{i}.json").write_text(json.dumps({"id": i}))

    seen = {}
    real = json_source.infer_persist_schema_core

    def spy(path, store, infer, glob, **kw):
        def infer_spy(sample):
            seen["n"] = len(sample) if isinstance(sample, list) else -1
            return infer(sample)
        return real(path, store, infer_spy, glob, **kw)

    monkeypatch.setattr(json_source, "infer_persist_schema_core", spy)
    s = json_source.infer_and_persist_schema(
        spark, landing, tmp_path / "s_deg.json", sample_files=0)
    assert seen["n"] == 1          # clamped, not the whole listing
    assert set(s.fieldNames()) == {"id"}


def test_inference_glob_miss_fallback_skips_non_data_files(
        spark, tmp_path):
    """ADVICE r8: a stray README.md in a glob-miss landing dir must not
    reach the inferrer — spark.read.json over non-JSON injects a
    _corrupt_record column that would be PERSISTED into the contract."""
    from iot_simulator_datalake_spark.sources.json_source import (
        infer_and_persist_schema)
    landing = tmp_path / "jsonl_landing_rm"
    landing.mkdir()
    (landing / "a.jsonl").write_text(json.dumps({"id": 1, "v": 2.0}))
    (landing / "README.md").write_text("# not data\nplain prose here\n")
    store = tmp_path / "schema_rm.json"
    s = infer_and_persist_schema(spark, landing, store)
    assert set(s.fieldNames()) == {"id", "v"}
    assert "_corrupt_record" not in json.loads(store.read_text())["fields"][0]


def test_schema_store_tmp_cleaned_on_publish_failure(
        spark, tmp_path, monkeypatch):
    """ADVICE r8: a failure between tmp creation and replace() must not
    strand a fresh-uuid orphan .tmp-* next to the store."""
    from pathlib import Path
    from iot_simulator_datalake_spark.sources.json_source import (
        infer_and_persist_schema)
    landing = tmp_path / "json_landing_tmpfail"
    landing.mkdir()
    (landing / "a.json").write_text(json.dumps({"id": 1}))
    store = tmp_path / "store_tf.json"

    real_replace = Path.replace

    def boom(self, target):
        if ".tmp-" in self.name:
            raise OSError("simulated publish failure")
        return real_replace(self, target)

    monkeypatch.setattr(Path, "replace", boom)
    try:
        infer_and_persist_schema(spark, landing, store)
    except OSError:
        pass
    monkeypatch.setattr(Path, "replace", real_replace)
    assert not list(tmp_path.glob("store_tf.json.tmp-*"))
    assert not store.exists()
