"""R1 role-indicator detection as a single ordered Catalyst `when` chain.

Reproduces reference relationship_logic.py:149-174: iterate the role
indicators in dict-then-list order; the first indicator that is present in
the lowered sentence AND sits within 80 chars of both entity positions
decides the relationship (0.95). The generic co-occurrence fallback
(EMPLOYED_BY, 0.5) never survives the 0.6 threshold, so it is simply not
generated. Positions use first-occurrence substring search
(`str.find` == `instr - 1`).

The chain compiles to one whole-stage-codegen'd expression — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rules import ROLE_INDICATOR_PAIRS, ROLE_INDICATOR_MAX_DISTANCE


def role_relationship_col(sent_lower: Column, person_pos: Column, org_pos: Column) -> Column:
    """Returns the winning role relationship type (string) or NULL.

    ``person_pos`` / ``org_pos`` are 0-based first-occurrence positions of
    the lowered entity texts in ``sent_lower`` (-1 when absent, matching
    str.find).
    """
    chain: Column | None = None
    for rel_type, indicator in ROLE_INDICATOR_PAIRS:
        ind_pos = F.instr(sent_lower, indicator) - 1
        cond = (
            (ind_pos >= 0)
            & (person_pos >= 0)
            & (org_pos >= 0)
            & (
                F.greatest(F.abs(ind_pos - person_pos), F.abs(ind_pos - org_pos))
                < ROLE_INDICATOR_MAX_DISTANCE
            )
        )
        chain = F.when(cond, F.lit(rel_type)) if chain is None else chain.when(cond, F.lit(rel_type))
    return chain.otherwise(F.lit(None))
