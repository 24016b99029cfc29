"""Property-based fuzz: the Spark-side extractor (kg/extract) and the
oracle (kg/oracle) are INDEPENDENT implementations of rules R1/R2/R3 —
hypothesis hammers them with adversarial conversations (unicode, nested
brackets, blanks, adjacent mentions, shuffled row order)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from kg.extract import extract_conversation
from kg.oracle import oracle_extract

surface = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="]"),
    min_size=0, max_size=8,
)
plain = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="[]"),
    min_size=0, max_size=10,
)


@st.composite
def turn_text(draw):
    parts = draw(st.lists(
        st.one_of(plain, surface.map(lambda s: f"[[{s}]]")), min_size=0, max_size=5))
    return "".join(parts)


@st.composite
def conversation(draw):
    n = draw(st.integers(1, 8))
    rows = []
    for t in range(n):
        role = draw(st.sampled_from(["user", "assistant", "tool"]))
        tool = draw(st.sampled_from(["search", "calc", None])) if role == "tool" else None
        text = draw(st.one_of(st.none(), turn_text()))
        rows.append(("cfuzz", t, role, text, tool))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])


@settings(max_examples=150, deadline=None, derandomize=True)
@given(conversation(), st.randoms())
def test_extractor_matches_oracle(pdf, rnd):
    # shuffle rows: extraction must be order-stable under (conv_id, turn_idx)
    shuffled = pdf.sample(frac=1.0, random_state=rnd.randint(0, 10**6))
    got = extract_conversation(shuffled)
    exp = pd.DataFrame(
        oracle_extract(pdf),
        columns=["conv_id", "turn_idx", "span_start", "subj_surface", "pred", "obj_surface"],
    )
    key = list(exp.columns)
    a = sorted(map(tuple, got[key].values.tolist()))
    b = sorted(map(tuple, exp[key].values.tolist()))
    assert a == b
