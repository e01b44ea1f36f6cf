"""Edit-distance join (operators/fuzzy.py): exact equivalence with a
brute-force all-pairs Levenshtein on mutated-name fixtures, the q-gram
count-bound recall guarantee, and plan quality (no cartesian, no
Python stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import fuzzy as FZ


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fixture():
    bases = [
        "acme regulatory holdings",
        "global compliance partners",
        "northwind safety bureau",
        "pacific data filings",
        "meridian audit office",
    ]
    rows = []
    k = 0
    for b in bases:
        rows.append((k, b)); k += 1
        rows.append((k, b.replace("a", "e", 1))); k += 1          # 1 sub
        rows.append((k, b[1:])); k += 1                            # 1 del
        rows.append((k, b + "x")); k += 1                          # 1 ins
        rows.append((k, b.replace("o", "0").replace("i", "1"))); k += 1  # several subs
    rows += [(k, "utterly unrelated zebra quartet"), (k + 1, "xylophone warehouse")]
    return rows


def _brute_pairs(rows, d):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            if _lev(sa.lower(), sb.lower()) <= d:
                out.add((min(ia, ib), max(ia, ib)))
    return out


@pytest.mark.parametrize("d", [1, 2, 3])
def test_fuzzy_dedup_matches_brute_force(spark, d):
    rows = _fixture()
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["a"], r["b"]): r["edit_distance"]
        for r in FZ.fuzzy_dedup_keys(df, "name", "id", max_dist=d).collect()
    }
    want = _brute_pairs(rows, d)
    assert set(got) == want
    for (a, b), dist in got.items():
        sa = dict(rows)[a].lower()
        sb = dict(rows)[b].lower()
        assert dist == _lev(sa, sb) <= d


def test_fuzzy_join_two_sided_and_case_insensitive(spark):
    left = spark.createDataFrame(
        [(1, "Johann Sebastian Bach"), (2, "Clara Schumann")], "pk long, who string"
    )
    right = spark.createDataFrame(
        [(10, "johan sebastian bach"), (11, "klara schuman"), (12, "ludwig beethoven")],
        "fk long, who string",
    )
    got = {
        (r["pk"], r["fk"]): r["edit_distance"]
        for r in FZ.fuzzy_join(
            left, right, "who", max_dist=2, left_id="pk", right_id="fk"
        ).collect()
    }
    assert got == {(1, 10): 1, (2, 11): 2}


def test_count_bound_not_just_any_overlap(spark):
    """Two long strings sharing a frequent gram ('ing ing ...') but far
    apart in edit distance must be pruned by the COUNT bound before the
    rescore (the property that kills the hub-gram blowup at scale)."""
    df = spark.createDataFrame(
        [(1, "singing ringing dinging kinging"), (2, "zzzz qqqq wwww eeee ing")],
        "id long, name string",
    )
    pairs = FZ.fuzzy_dedup_keys(df, "name", "id", max_dist=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert pairs.count() == 0
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_short_string_exclusion_is_documented_not_a_crash(spark):
    # below the bound (max_len + q - 1 <= d*q) zero-overlap pairs are
    # the documented exclusion; same-gram short strings still match
    df = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, "abe")], "id long, name string"
    )
    got = {(r["a"], r["b"]) for r in FZ.fuzzy_dedup_keys(df, "name", "id", max_dist=2).collect()}
    assert (1, 3) in got  # "ab" vs "abe": shares padded grams, ed 1
    assert (1, 2) not in got  # zero shared grams: excluded by design


def test_qgram_array_shape(spark):
    row = spark.range(1).select(FZ.qgram_array(F.lit("abc"), q=3).alias("g")).first()
    assert len(row["g"]) == 3 + 3 - 1  # L + q - 1
    assert row["g"][0] == "\x01\x01a" and row["g"][-1] == "c\x02\x02"


def test_fuzzy_pairs_match_duckdb_brute_force_on_corpus(spark, sf_dir):
    """Independent engine check on REAL corpus data: DuckDB brute-forces
    all-pairs levenshtein over the sf0.001 title prefixes; the Spark
    operator's filtered plan must return the identical pair set."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = set(
        map(
            tuple,
            con.execute(
                """
        WITH t AS (SELECT doc_id, lower(substr(text, 1, 40)) AS s FROM documents)
        SELECT a.doc_id, b.doc_id, levenshtein(a.s, b.s) AS d
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.s, b.s) <= 3
        """
            ).fetchall(),
        )
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.substring("text", 1, 40).alias("title")
    )
    got = {
        (r["a"], r["b"], r["edit_distance"])
        for r in FZ.fuzzy_dedup_keys(docs, "title", "doc_id", max_dist=3).collect()
    }
    assert got == want
    assert want  # non-vacuous: the corpus really contains near-dup prefixes


def test_gram_explode_carries_no_string_payload(spark):
    """VERDICT r9 scale polish: the gram explode must emit ids+len+pos
    only — a length-L string riding its own L+q−1 gram rows puts
    O(L²) bytes per string through the candidate shuffle. Strings
    re-join by id over the DEDUPED pair set at rescore."""
    df = spark.createDataFrame(
        [(1, "acme holdings"), (2, "acme holdingz"), (3, "other corp")],
        ["id", "s"],
    )
    plans = [
        FZ.fuzzy_dedup_keys(df, "s", "id")._jdf.queryExecution()
        .optimizedPlan().toString(),
        FZ.fuzzy_join(
            df, df.select(F.col("id").alias("rid"), "s"), "s",
            left_id="id", right_id="rid",
        )._jdf.queryExecution().optimizedPlan().toString(),
    ]
    for plan in plans:
        gen_lines = [ln for ln in plan.splitlines() if "posexplode" in ln]
        assert gen_lines, "gram explode missing from plan"
        for ln in gen_lines:
            # the Generate node's retained-output list must not carry
            # the lowered string attribute (l_s / r_s)
            assert "l_s#" not in ln and "r_s#" not in ln, ln
