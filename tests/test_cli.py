"""CLI tests: codec subcommands (pure) + Spark-backed checksum/diff/scan."""

import json

import pytest

from tikv_data_compare_spark import cli, codec


def test_cli_format(capsys):
    assert cli.main(["format", "--key", "6162", "--format", "hex"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["hex"] == "6162" and out["raw"] == "ab"


def test_cli_decodets(capsys):
    key = codec.hex_upper(codec.encode_ts(42))
    assert cli.main(["decodets", "--key", key, "--format", "hex"]) == 0
    assert json.loads(capsys.readouterr().out)["ts"] == 42


def test_cli_encodekey(capsys):
    assert cli.main(["encodekey", "--key", "abc", "--format", "raw"]) == 0
    enc = json.loads(capsys.readouterr().out)["encoded_hex"]
    assert codec.decode_key_v2(bytes.fromhex(enc)) == b"abc"


@pytest.fixture(scope="module")
def two_tables(spark, tmp_path_factory, lineitem):
    from pyspark.sql import functions as F

    from tikv_data_compare_spark.model import unique_by_key

    d = tmp_path_factory.mktemp("cli")
    base = unique_by_key(lineitem, ["l_orderkey", "l_linenumber"]).limit(300)
    src, dst, dst_eq = str(d / "src.pq"), str(d / "dst.pq"), str(d / "dst_eq.pq")
    base.write.mode("overwrite").parquet(src)
    base.write.mode("overwrite").parquet(dst_eq)
    base.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 41 == 0, F.col("l_quantity") + 1).otherwise(F.col("l_quantity")),
    ).write.mode("overwrite").parquet(dst)
    return src, dst, dst_eq


def test_cli_checksum_verdicts(capsys, two_tables):
    src, dst, dst_eq = two_tables
    keys = "l_orderkey,l_linenumber"
    assert cli.main(["checksum", "--src", src, "--dst", dst_eq, "--keys", keys]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["equal"] is True
    assert cli.main(["checksum", "--src", src, "--dst", dst, "--keys", keys]) == 1


def test_cli_diff_reports(capsys, two_tables):
    src, dst, _ = two_tables
    rc = cli.main(["diff", "--src", src, "--dst", dst, "--keys", "l_orderkey,l_linenumber"])
    assert rc == 1
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert lines and all(json.loads(l)["status"] == "changed" for l in lines)


def test_cli_typed_int_key_bounds(capsys, two_tables):
    """Integer-keyed tables interpret --start/end-key as decimal integers.
    Regression: bounds went through int.from_bytes(parse_key(...)), turning
    '1000' into 825241648 and silently returning the wrong range."""
    import duckdb

    src, _, dst_eq = two_tables
    keys = "l_orderkey,l_linenumber"
    # pick decimal bounds straddling real data so the range is non-empty
    lo, hi = duckdb.sql(
        f"SELECT min(l_orderkey), median(l_orderkey)::BIGINT FROM read_parquet('{src}/*.parquet')"
    ).fetchone()
    expected = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{src}/*.parquet') "
        f"WHERE l_orderkey >= {lo} AND l_orderkey < {hi}"
    ).fetchone()[0]
    assert expected > 0
    rc = cli.main(
        ["checksum", "--src", src, "--dst", dst_eq, "--keys", keys,
         "--start-key", str(lo), "--end-key", str(hi)]
    )
    assert rc == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["equal"] is True
    assert v["src"]["total_kvs"] == expected


def test_cli_typed_bound_rejects_non_decimal(two_tables):
    src, dst, _ = two_tables
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(
            ["checksum", "--src", src, "--dst", dst, "--keys", "l_orderkey",
             "--start-key", "0xFF"]
        )


def test_cli_checksum_crc64_typed(capsys, two_tables):
    """--algo crc64 on a typed parquet table runs green (regression: crashed
    with DATATYPE_MISMATCH since round 1)."""
    src, _, dst_eq = two_tables
    rc = cli.main(
        ["checksum", "--src", src, "--dst", dst_eq,
         "--keys", "l_orderkey,l_linenumber", "--algo", "crc64"]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["equal"] is True


def test_cli_scan_export(capsys, two_tables, tmp_path):
    src, _, _ = two_tables
    out_dir = str(tmp_path / "dump")
    rc = cli.main(
        ["scan", "--src", src, "--keys", "l_orderkey,l_linenumber", "--out", out_dir]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["out"] == out_dir
    import glob

    assert glob.glob(f"{out_dir}/part-*")
