"""Similarity kernels vs DuckDB builtins — the oracle-parity contract."""

import duckdb
import numpy as np
import pytest

from localhost_address_matching_ray.functions.similarity import (
    char_jaccard,
    cosine_topk,
    jaro_winkler,
    levenshtein,
    levenshtein_batch,
    token_set_jaccard,
)

WORD_PAIRS = [
    ("kitten", "sitting"),
    ("flaw", "lawn"),
    ("", "abc"),
    ("abc", ""),
    ("same", "same"),
    ("main_loader", "main-loader"),
    ("data_merge_12", "data_merge_21"),
    ("x", "yz"),
]


@pytest.mark.parametrize("s,t", WORD_PAIRS)
def test_levenshtein_matches_duckdb(s, t):
    if not s or not t:
        # DuckDB levenshtein errors on empty input; our kernel defines it
        assert levenshtein(s, t) == max(len(s), len(t))
        return
    exp = duckdb.sql(f"select levenshtein('{s}','{t}')").fetchone()[0]
    assert levenshtein(s, t) == exp


def test_levenshtein_batch_matches_scalar_and_duckdb():
    rng = np.random.RandomState(3)
    alpha = list("abcdé_ /.漢")
    pairs = [
        (
            "".join(rng.choice(alpha, rng.randint(0, 14))),
            "".join(rng.choice(alpha, rng.randint(0, 14))),
        )
        for _ in range(300)
    ] + WORD_PAIRS
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    got_cp = levenshtein_batch(a, b, unit="codepoint")
    assert got_cp.tolist() == [levenshtein(s, t) for s, t in pairs]
    got_by = levenshtein_batch(a, b)  # byte-level = DuckDB semantics
    con = duckdb.connect()
    for (s, t), d in zip(pairs, got_by):
        if not s or not t:
            assert d == max(len(s.encode()), len(t.encode()))
            continue
        assert d == con.execute("select levenshtein(?, ?)", [s, t]).fetchone()[0]


def test_soundex_official_vectors():
    from localhost_address_matching_ray.functions.phonetic import soundex_batch

    vec = {
        "Robert": "R163", "Rupert": "R163", "Tymczak": "T522",
        "Pfister": "P236", "Ashcraft": "A261", "Ashcroft": "A261",
        "Honeyman": "H555", "Williams": "W452", "Jackson": "J250",
        "Washington": "W252", "Lee": "L000", "Gutierrez": "G362",
        "O'Brien": "O165", "": "", "123": "", "hhh": "H000",
    }
    got = soundex_batch(list(vec))
    assert got.tolist() == list(vec.values())


def test_soundex_batch_matches_sql_mirror():
    from localhost_address_matching_ray.functions.phonetic import (
        soundex_batch,
        soundex_sql,
    )

    rng = np.random.RandomState(17)
    alpha = list("abcdXYZhw '-129é ")
    names = [
        "".join(rng.choice(alpha, rng.randint(0, 16))) for _ in range(600)
    ] + ["Hwang", "Wszystko", "aeiou", "é", "éb", "cold widget"]
    con = duckdb.connect()
    con.execute("create table t(s varchar)")
    con.executemany("insert into t values (?)", [(s,) for s in names])
    sql = [r[0] for r in con.execute(f"select {soundex_sql('s')} from t").fetchall()]
    assert soundex_batch(names).tolist() == sql


def test_levenshtein_batch_empty_and_bad_unit():
    assert levenshtein_batch([], []).tolist() == []
    with pytest.raises(ValueError):
        levenshtein_batch(["a"], ["b"], unit="word")


@pytest.mark.parametrize("s,t", [(s, t) for s, t in WORD_PAIRS if s and t])
def test_jaro_winkler_matches_duckdb(s, t):
    exp = duckdb.sql(f"select jaro_winkler_similarity('{s}','{t}')").fetchone()[0]
    assert jaro_winkler(s, t) == pytest.approx(exp, abs=1e-9)


@pytest.mark.parametrize("s,t", [(s, t) for s, t in WORD_PAIRS if s and t])
def test_char_jaccard_matches_duckdb(s, t):
    exp = duckdb.sql(f"select jaccard('{s}','{t}')").fetchone()[0]
    assert char_jaccard(s, t) == pytest.approx(exp, abs=1e-12)


def test_token_set_jaccard_matches_duckdb_lists():
    a, b = ["x", "y", "z", "z"], ["y", "z", "w"]
    exp = duckdb.sql(
        "select len(list_intersect(list_distinct(['x','y','z','z']), list_distinct(['y','z','w'])))"
        " / len(list_distinct(['x','y','z','z'] || ['y','z','w']))"
    ).fetchone()[0]
    assert token_set_jaccard(a, b) == exp  # exact IEEE division of same ints


def test_cosine_topk_agrees_with_duckdb():
    rng = np.random.RandomState(11)
    corpus = rng.randn(40, 8)
    queries = corpus[:3]
    qi, ci, score = cosine_topk(queries, corpus, k=5)
    con = duckdb.connect()
    con.execute("create table e as select * from (values " + ",".join(
        f"({i}, {list(map(float, corpus[i]))})" for i in range(40)
    ) + ") t(id, v)")
    for q in range(3):
        rows = con.execute(
            f"""select id from (
                  select id, round(list_cosine_similarity(v, {list(map(float, queries[q]))}), 6) s
                  from e) order by s desc, id limit 5"""
        ).fetchall()
        mine = [int(ci[j]) for j in range(len(qi)) if qi[j] == q]
        assert mine == [r[0] for r in rows]


def test_jaro_batch_matches_duckdb_bit_exact():
    """jaro_batch / jaro_winkler_batch at unit='byte' are BIT-identical to
    DuckDB jaro_similarity / jaro_winkler_similarity (byte symbols, window
    clipped at 0, boost only when jaro > 0.7, empty side -> 0.0)."""
    import pyarrow as pa
    from localhost_address_matching_ray.functions.similarity import (
        jaro_batch,
        jaro_winkler_batch,
    )

    rng = np.random.RandomState(17)
    alpha = list("abcdexyz_./é日")
    a_list = ["".join(rng.choice(alpha, rng.randint(0, 22))) for _ in range(400)]
    b_list = ["".join(rng.choice(alpha, rng.randint(0, 22))) for _ in range(400)]
    edges = [
        ("", ""), ("", "a"), ("a", ""), ("a", "a"), ("ab", "ba"),
        ("a", "ab"), ("aa", "aaa"), ("martha", "marhta"),
        ("dwayne", "duane"), ("dixon", "dicksonx"), ("héllo", "hello"),
    ]
    a_list += [e[0] for e in edges]
    b_list += [e[1] for e in edges]
    con = duckdb.connect()
    con.register("t", pa.table({"a": a_list, "b": b_list}))
    exp_j = np.array([r[0] for r in con.sql("select jaro_similarity(a,b) from t").fetchall()])
    exp_w = np.array([r[0] for r in con.sql("select jaro_winkler_similarity(a,b) from t").fetchall()])
    got_j = jaro_batch(a_list, b_list)
    got_w = jaro_winkler_batch(a_list, b_list)
    assert got_j.tolist() == exp_j.tolist()  # ==, not approx: bit parity
    assert got_w.tolist() == exp_w.tolist()


def test_jaro_winkler_batch_unthresholded_matches_scalar():
    """boost_threshold=0 reproduces the scalar flagship kernel on codepoints."""
    from localhost_address_matching_ray.functions.similarity import jaro_winkler_batch

    pairs = [(s, t) for s, t in WORD_PAIRS if s and t]
    got = jaro_winkler_batch(
        [p[0] for p in pairs], [p[1] for p in pairs],
        unit="codepoint", boost_threshold=0.0,
    )
    for (s, t), g in zip(pairs, got):
        assert g == jaro_winkler(s, t)
