"""R7 confidence scoring as pure column expressions (reference
relationship_logic.py:106-147): base 0.5, +0.3 for a high-confidence verb,
+0.3 if any strong indicator appears in the sentence, ±distance term from
first-occurrence positions, clamped to [0, 1]. Codegen'd — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rules import HIGH_CONFIDENCE_VERBS, STRONG_INDICATORS


def confidence_col(subj: Column, obj: Column, verb: Column, sentence: Column) -> Column:
    sent_lower = F.lower(sentence)

    verb_bonus = F.when(F.lower(verb).isin(HIGH_CONFIDENCE_VERBS), F.lit(0.3)).otherwise(F.lit(0.0))

    indicator_hit = F.lit(False)
    for ind in STRONG_INDICATORS:
        indicator_hit = indicator_hit | (F.instr(sent_lower, ind.lower()) > 0)
    indicator_bonus = F.when(indicator_hit, F.lit(0.3)).otherwise(F.lit(0.0))

    p1 = F.instr(sent_lower, F.lower(subj)) - 1
    p2 = F.instr(sent_lower, F.lower(obj)) - 1
    dist = F.abs(p1 - p2)
    distance_term = (
        F.when((p1 >= 0) & (p2 >= 0) & (dist < 30), F.lit(0.2))
        .when((p1 >= 0) & (p2 >= 0) & (dist > 100), F.lit(-0.1))
        .otherwise(F.lit(0.0))
    )

    raw = F.lit(0.5) + verb_bonus + indicator_bonus + distance_term
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw))
