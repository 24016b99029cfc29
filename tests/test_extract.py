"""Stage-1 extraction unit tests (SURVEY.md §5: extraction UDF on a
hand-written conversation; per-turn text-equality invariant)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from kg.extract import extract_conversation, extract_mentions, extract_triples, round_trip_text
from kg.schema import TRANSCRIPTS_SCHEMA

HAND_CONV = pd.DataFrame(
    [
        # turn 0: two mentions → one co_occurs_with
        ("c1", 0, "user", "Compare [[Alpha]] with [[Beta]] now.", None),
        # turn 1: one mention → followed_by from Beta
        ("c1", 1, "assistant", "Sure, [[Gamma]] is related.", None),
        # turn 2: tool turn, one mention → produced_by + followed_by
        ("c1", 2, "tool", "result: [[Alpha]]", "search"),
        # turn 3: no mentions → breaks no chains (prev_last survives)
        ("c1", 3, "user", "thanks", None),
        # turn 4: mention → followed_by from turn-2 Alpha
        ("c1", 4, "assistant", "Also see [[Delta]].", None),
    ],
    columns=["conv_id", "turn_idx", "role", "text", "tool"],
)


def test_hand_conversation_rules():
    out = extract_conversation(HAND_CONV)
    triples = set(zip(out["subj_surface"], out["pred"], out["obj_surface"]))
    assert ("Alpha", "co_occurs_with", "Beta") in triples
    assert ("Beta", "followed_by", "Gamma") in triples
    assert ("Gamma", "followed_by", "Alpha") in triples
    assert ("Alpha", "produced_by", "tool::search") in triples
    # chain skips the mention-less turn 3: Alpha(turn2) → Delta(turn4)
    assert ("Alpha", "followed_by", "Delta") in triples
    assert len(out) == 5


def test_extraction_is_order_stable():
    shuffled = HAND_CONV.sample(frac=1.0, random_state=7)
    assert extract_conversation(shuffled).equals(extract_conversation(HAND_CONV))


def test_spark_extraction_matches_local(spark):
    pdf = HAND_CONV.assign(ts=dt.datetime(2025, 1, 1))
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    got = extract_triples(df).toPandas()
    exp = extract_conversation(HAND_CONV)
    key = ["conv_id", "turn_idx", "span_start", "subj_surface", "pred", "obj_surface"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, exp[key].values.tolist())
    )


def test_per_turn_text_equality_invariant(spark, transcripts_df, transcripts_pdf):
    """BASELINE.json input_hint: round-trip through the Arrow stage must
    preserve every turn's text under stable (conv_id, turn_idx) order."""
    back = (
        round_trip_text(transcripts_df)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    orig = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert back["text"].tolist() == orig["text"].tolist()
    assert back["conv_id"].tolist() == orig["conv_id"].tolist()
    assert back["turn_idx"].tolist() == orig["turn_idx"].tolist()


def test_mentions_builtin_matches_udf(spark, transcripts_df, transcripts_pdf):
    """extract_mentions (pure built-ins) agrees with the regex rules."""
    got = extract_mentions(transcripts_df).count()
    import re

    exp = sum(len(re.findall(r"\[\[(.*?)\]\]", t)) for t in transcripts_pdf["text"])
    assert got == exp
