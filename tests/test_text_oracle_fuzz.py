"""Cross-engine fuzz for the text-analytics oracle pairs: run the
REGISTRY queries and their DuckDB oracles over an adversarial
synthetic documents table (whitespace zoo incl. vertical tab,
multilingual text, CJK, quotes, digit runs, pathological repeats)
and require exact agreement — the same comparison the driver gate
does, on inputs the sf corpus never contains.

Found-by-this-test (r5): Java's \\s matches vertical tab (\\x0B),
RE2's does not, so every regex shared between a Spark expression and
its DuckDB mirror must spell the whitespace class out
(textstats.PORTABLE_WS). The corpus here keeps \\x0B rows forever so
a regression to '\\s' fails loudly.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

WORDS = {
    "en": "the of and to in is that it was for on are as with".split(),
    "de": "der die und ich nicht das ist sich eine schon über".split(),
    "fr": "le la les et que des une dans pour est était".split(),
    "es": "de la que el en los del las una por ción".split(),
    "it": "di che la il non per una sono gli della zione".split(),
    "zh": list("这是一个测试的结果表明新方法数据扩展良好"),
    "junk": ["qzx", "wvk", "jqp", "zzt", "xkcv", "bnm", "123", "42",
             "it's", "a:b", "(x)", "co-op", "…", "—", "naïve", "café"],
    # full-vs-simple Unicode case-mapping divergence bait: Spark
    # lowercases İ to i+U+0307 and final Σ to ς; DuckDB maps both
    # simply — portable_lower must pre-fold them (r5 finding #2)
    "case": ["İstanbul", "ΣΊΣΥΦΟΣ", "ΤΕΛΟΣ", "NAÏVE", "ẞß", "CAFÉ",
             "Σ", "İ", "ǅungla", "İT", "İS", "ΣA"],
}
WS = [" ", "  ", "\t", "\n", "\x0b", "\f", "\r", " \t ", "\n\n", " "]


def _fuzz_docs(n: int = 120, seed: int = 5) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    pools = list(WORDS)
    for i in range(n):
        pool = WORDS[pools[i % len(pools)]]
        k = rng.randint(1, 40)
        toks = [rng.choice(pool) for _ in range(k)]
        if rng.random() < 0.3:          # pathological repeat block
            toks += [toks[0]] * rng.randint(2, 10)
        text = ""
        for t in toks:
            text += t + rng.choice(WS)
        if rng.random() < 0.2:
            text = rng.choice(WS) + text    # leading whitespace
        rows.append((i, text.rstrip() if rng.random() < 0.5 else text,
                     pools[i % len(pools)], "fuzz", len(text)))
    # fixed edge rows: empty, ws-only, single char, vertical-tab-only
    base = len(rows)
    for j, text in enumerate(["", " ", "\x0b", "a", "一", "the\x0bof the"]):
        rows.append((base + j, text, "edge", "fuzz", len(text)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


# the documents-table-only oracle pairs whose regexes/arithmetic the
# fuzz corpus stresses (queries needing other tables are out of scope)
FUZZ_QUERIES = ["q_langid", "q_textstats", "q_fingerprint",
                "q_repetition", "q_quality_filter", "q_dedup_exact"]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzzdocs")
    _fuzz_docs().to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_text_oracles_agree_on_adversarial_corpus(spark, fuzz_dir, name):
    import duckdb

    from promptner_spark.plans.queries import ORACLE_SQL, QUERIES
    from tools.compare_oracle import normalize

    sdf = QUERIES[name](spark, fuzz_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{fuzz_dir}/documents.parquet'")
    odf = con.sql(ORACLE_SQL[name]).df()
    s, o = normalize(sdf), normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o), (len(s), len(o))
    pd.testing.assert_frame_equal(s, o, check_dtype=False)
