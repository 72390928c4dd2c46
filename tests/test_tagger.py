"""Rule-based entity tagger: golden input→output pairs (the reference's
test_normalize.py style), span→BIO alignment properties
(ner_address_parser.py:63-98 analogs), and the actor-pool stage contract."""

import pyarrow as pa
import ray.data

from localhost_address_matching_ray.stages.tagger import (
    EntityTagger,
    Span,
    join_entities_flat,
    spans_to_bio,
    tag_documents,
    token_spans,
)

GOLDEN = [
    # (text, pred_tags, entities_flat)
    ("order 42 shipped", "O B-NUM O", "NUM=42"),
    ("ids 1 2 3 done", "O B-NUM I-NUM I-NUM O", "NUM=1 2 3"),
    ("see https://a.io now", "O B-URL O", "URL=https://a.io"),
    ("mail bob@x.co please", "O B-EMAIL O", "EMAIL=bob@x.co"),
    ("MAX_SIZE is 10", "B-CONST O B-NUM", "CONST=MAX_SIZE | NUM=10"),
    ("use fooBar here", "O B-CAMEL O", "CAMEL=fooBar"),
    ("", "", ""),
    ("plain words only", "O O O", ""),
    # priority: all-digits beats nothing else; CONST needs len >= 3
    ("AB 007", "O B-NUM", "NUM=007"),
]


def test_golden_pairs():
    tagger = EntityTagger()
    for text, want_tags, want_flat in GOLDEN:
        tags, spans, flat_texts = tagger.tag_one(text)
        assert " ".join(tags) == want_tags, text
        assert join_entities_flat(spans, flat_texts) == want_flat, text


def test_tag_count_equals_token_count():
    tagger = EntityTagger()
    for text, _, _ in GOLDEN:
        tags, _, _ = tagger.tag_one(text)
        assert len(tags) == len(token_spans(text))


def test_spans_to_bio_overlap_join():
    """The alignment is a real char-overlap join: spans not token-aligned
    still tag the overlapping tokens (B- on the span-starting token)."""
    text = "alpha beta gamma"
    tags = spans_to_bio(text, [Span("X", "beta gamma", 6, 16)])
    assert tags == ["O", "B-X", "I-X"]
    # span covering a token's tail only → that token still overlaps → B-
    tags = spans_to_bio(text, [Span("Y", "ta", 8, 10)])
    assert tags == ["O", "B-Y", "O"]


def test_slice_vs_flat_text():
    """Nested entities keep the true char slice; the flat projection uses
    the single-space token join (SQL-parity)."""
    tagger = EntityTagger()
    text = "1  2"  # two spaces
    tags, spans, flat_texts = tagger.tag_one(text)
    assert spans[0].text == "1  2"      # faithful slice
    assert flat_texts[0] == "1 2"       # normalized join
    assert tags == ["B-NUM", "I-NUM"]


def test_actor_stage_appends_columns():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["MAX_SIZE is 10", ""], pa.string()),
    }))
    out = tag_documents(docs, concurrency=(1, 2)).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_entities"] == 2
    assert by_id[1]["entities"][0]["type"] == "CONST"
    assert by_id[1]["entities"][0]["start"] == 0
    assert by_id[2]["pred_tags"] == "" and by_id[2]["entities"] == []


def test_custom_rules():
    """User-supplied rule set (the extra_rules-style extension surface)."""
    tagger = EntityTagger(rules=[("HEX", r"^0x[0-9a-f]+$")])
    tags, spans, _ = tagger.tag_one("addr 0xff end")
    assert " ".join(tags) == "O B-HEX O"
    assert spans[0].type == "HEX"


def test_tag_documents_preserve_order():
    """preserve_order=True: output row order == input row order across many
    blocks (the reference CLI's aligned-predictions contract)."""
    import pyarrow as pa
    import ray.data

    from localhost_address_matching_ray.stages.tagger import tag_documents

    n = 2000
    docs = ray.data.from_arrow([
        pa.table({
            "doc_id": pa.array(list(range(i, min(i + 100, n))), pa.int64()),
            "text": pa.array(
                [f"word{j} NUM{j} {j}" for j in range(i, min(i + 100, n))],
                pa.string(),
            ),
        })
        for i in range(0, n, 100)
    ])
    out = tag_documents(docs, batch_size=64, concurrency=(1, 4), preserve_order=True)
    got = [r["doc_id"] for r in out.take_all()]
    assert got == list(range(n))


def test_whitespace_lut_matches_re():
    """The vectorized tokenizer's whitespace LUT must equal Python re's \\s
    over the whole codepoint range — exhaustive parity check (the tokenizer
    contract is \\S+ finditer)."""
    import re

    from localhost_address_matching_ray.stages.tagger import _WS_CODEPOINTS

    ws = {cp for cp in range(0x110000) if re.match(r"\s", chr(cp))}
    assert ws == set(_WS_CODEPOINTS)


def _tagger_frame(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_vectorized_call_equals_scalar_path():
    """The numpy/Arrow __call__ must byte-match the scalar tag_one path on
    adversarial inputs: unicode whitespace, multibyte tokens, runs of
    spaces, empty docs, astral codepoints, every rule type, doc boundaries."""
    t = EntityTagger()
    texts = [
        "order 42 shipped to bob@x.co via https://a.io",
        "",                                        # empty doc between docs
        "  leading  and   trailing   ",
        "MAX_SIZE fooBar 007 AB plain",
        "tab\tsep nbsp\xa0ls\u2028ideo\u3000end",   # exotic whitespace
        "h\xe9llo w\xf6rld 42 na\xefve caf\xe9",    # multibyte tokens
        "emoji \U0001f389(42)\U0001f389 mixed",       # astral codepoints
        "1 2 3",                                   # multi-token entity
        "fs\x1csep 9",                             # 0x1c is Python-ws only
        "x",                                       # 1-char doc
    ]
    batch = _tagger_frame(texts)
    vec = t(batch)
    ref = t._call_scalar(batch)
    assert vec.schema == ref.schema
    for col in ("pred_tags", "n_entities", "entities_flat", "entities"):
        assert vec[col].to_pylist() == ref[col].to_pylist(), col


def test_vectorized_call_fuzz_equals_scalar():
    import random

    rng = random.Random(7)
    vocab = ["42", "x1", "https://q.io", "a@b.cd", "FOO_BAR", "camelCase",
             "plain", "7", "\xc5BC", "\xdf", "\U0001f389", "A_B", "i"]
    ws = [" ", "  ", "\t", "\n", "\xa0", " "]
    texts = []
    for _ in range(60):
        n = rng.randint(0, 12)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(vocab))
            parts.append(rng.choice(ws))
        texts.append("".join(parts))
    t = EntityTagger()
    batch = _tagger_frame(texts)
    vec, ref = t(batch), t._call_scalar(batch)
    for col in ("pred_tags", "n_entities", "entities_flat", "entities"):
        assert vec[col].to_pylist() == ref[col].to_pylist(), col


def test_non_re2_rule_falls_back_to_python():
    """A lookbehind rule (RE2-incompatible) must still work — per-unique
    Python fallback — alongside vectorized rules."""
    rules = [("NUM", r"^[0-9]+$"), ("POST", r"(?<=_)x$")]
    t = EntityTagger(rules)
    assert t._re2_ok == [True, False]
    batch = _tagger_frame(["a_x 12 ax"])
    out = t(batch)
    assert out["pred_tags"].to_pylist() == ["B-POST B-NUM O"]
    assert out["entities_flat"].to_pylist() == ["POST=a_x | NUM=12"]
