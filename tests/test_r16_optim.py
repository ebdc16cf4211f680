"""Round-16 optimization pins.

Each test guards an operator rewrite that changed internals while
keeping results bit-identical:

* ``lm.char_trigrams`` -- one codegen'd ``regexp_extract_all`` replaced
  the interpreted HOF pipeline (r12 form).  The pin replays the OLD
  formulation (transform/filter/sequence/substring) next to the new one
  over adversarial inputs: supplementary-plane characters (the bare
  zero-width lookahead splits surrogate pairs -- the consuming-dot
  pattern must not), Unicode line separators (``(?s)`` required), null
  text (must stay the empty array, not null), and short strings.
* ``text.tokens`` -- ``regexp_extract_all('[a-z0-9]+')`` replaced
  split-on-complement + drop-empties; the pin replays the old split
  form on the same adversarial set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_pipeline_text_processing_spark.operators.lm import char_trigrams
from airflow_pipeline_text_processing_spark.operators.text import tokens


def _old_char_trigrams(col):
    """The r12 HOF formulation, verbatim (the semantics being pinned)."""
    s = F.regexp_replace(F.lower(col), r"\s+", " ")
    return F.transform(
        F.array(s),
        lambda sv: F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(sv) - 2, F.lit(1))),
                lambda i: F.substring(sv, i, 3),
            ),
            lambda g: F.length(g) == 3,
        ),
    )[0]


def _old_tokens(col):
    """The pre-r16 split + filter formulation, verbatim."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


ADVERSARIAL = [
    None,
    "",
    " ",
    "ab",
    "abc",
    "abcd",
    "a  b\t\nc d",
    "tab\tand\x0bvt\x0cff\rcr mix",
    "héllo wörld straße",
    "ÉΣΩ aBc MiXeD",
    " nbsp padded ",
    "line sep andnel",  # line separators: (?s) territory
    "emoji \U0001F600\U0001F601 pair",  # surrogate pairs in UTF-16
    "\U0001F600\U0001F601\U0001F602",  # supplementary-only text
    "a\U0001F600b\U0001F601c",  # BMP/astral interleave
    "ligature ﬁle İstanbul ı",
    "digits 12345 mixed a1b2c3",
    "  leading and trailing  ",
    "!!!only---separators???",
]


@pytest.mark.parametrize("fn_new,fn_old", [
    (char_trigrams, _old_char_trigrams),
    (tokens, _old_tokens),
], ids=["char_trigrams", "tokens"])
def test_regexp_rewrites_match_old_formulations(spark, fn_new, fn_old):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "text string")
    rows = df.select(
        "text", fn_old(F.col("text")).alias("a"), fn_new(F.col("text")).alias("b")
    ).collect()
    for r in rows:
        assert r.a == r.b, (
            f"rewrite diverges on {r.text!r}: old={r.a!r} new={r.b!r}"
        )
    # the fixture exercises the regimes the rewrite could break:
    # non-empty output exists, and the null row yields [] for trigrams
    by_text = {r.text: r for r in rows}
    assert by_text[None].b is not None or fn_new is tokens  # trigrams: []
    assert any(r.b for r in rows)
