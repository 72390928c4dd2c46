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
