"""Self-tests for tools/round_lint.py — the static determinism lint
that freezes the fractional-ROUND class (VERDICT r7 #5).  The rule
must FIRE on a synthetic violation (both the Spark-source form and
the oracle-SQL form) and the repo at HEAD must be clean, so any new
fractional round landing outside the allowlist breaks the suite, not
just the round-close ritual."""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, "/root/repo/tools")

from round_lint import ALLOW, scan_module_source, scan_oracle_sql  # noqa: E402


def test_source_rule_fires_on_fractional_round():
    src = (
        "from pyspark.sql import functions as F\n"
        "def my_new_query(spark, sf_dir):\n"
        "    df = spark.range(3)\n"
        "    return df.select(F.round(F.col('id') / 7, 2).alias('r'))\n")
    hits = scan_module_source("synthetic.py", src)
    assert hits == [("synthetic.py", 4, "my_new_query", 2)]
    assert "my_new_query" not in ALLOW


def test_source_rule_fires_on_builtin_round():
    src = ("def helper(x):\n"
           "    return round(x / 3, 5)\n")
    assert scan_module_source("mod.py", src) == [("mod.py", 2, "helper", 5)]


def test_source_rule_fires_on_keyword_lit_and_nonconstant_forms():
    src = (
        "from pyspark.sql import functions as F\n"
        "def f(df, x, somevar):\n"
        "    a = F.round(df.c, scale=3)\n"
        "    b = round(x, ndigits=2)\n"
        "    c = F.round(df.c, F.lit(4))\n"
        "    d = F.round(df.c, somevar)\n")
    hits = scan_module_source("m.py", src)
    assert hits == [("m.py", 3, "f", 3), ("m.py", 4, "f", 2),
                    ("m.py", 5, "f", 4),
                    ("m.py", 6, "f", "non-constant")]


def test_source_rule_quiet_on_integer_round():
    src = (
        "from pyspark.sql import functions as F\n"
        "def q(df):\n"
        "    a = F.round(F.col('x') * 100)          # scale-to-int\n"
        "    b = F.round(F.col('x') * 1000, 0)      # explicit 0\n"
        "    c = round(2.5)                          # builtin, no scale\n"
        "    return a, b, c\n")
    assert scan_module_source("mod.py", src) == []


def test_oracle_rule_fires_and_handles_nesting():
    sql = ("SELECT ROUND(SUM(ROUND(x * 100)) / COUNT(*), 3) AS bad, "
           "ROUND(y) AS ok, ROUND(z, 0) AS ok2 FROM t")
    assert scan_oracle_sql("q", sql) == [("q", 3)]


def test_repo_is_clean_at_head():
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/round_lint.py"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "0 violations" in out.stdout
