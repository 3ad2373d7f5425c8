"""IAM-style permission evaluation — the reference's biggest UDF-shaped
logic (cartography/intel/aws/permission_relationships.py:25-442):
wildcard patterns (``*`` any-run, ``?`` single char) from policy statements
are matched case-insensitively against permission/resource names, with
action / notaction / resource / notresource and explicit-deny semantics
(evaluate_* :25-254, compile_regex :395-442).

Spark-native: patterns compile to SQL LIKE (``*``->``%``, ``?``->``_``,
escaping literal ``%_``) so matching stays JVM-side in a join condition —
no Python UDF. ``evaluate_policy_grid`` computes, for a principals x
permissions grid, whether any allow statement matches with no deny match:
the reference's ``principal_allowed_on_resource`` (:157-181) as one
relational expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def wildcard_to_like(pattern: Column) -> Column:
    """Translate ``*``/``?`` wildcards to a LIKE pattern, escaping LIKE
    metacharacters (mirrors compile_regex, permission_relationships.py:395-442,
    which regex-escapes then maps * -> .* and ? -> .)."""
    escaped = F.regexp_replace(pattern, r"([%_\\])", r"\\$1")
    return F.replace(F.replace(escaped, F.lit("*"), F.lit("%")), F.lit("?"), F.lit("_"))


def wildcard_match(value: Column, pattern: Column) -> Column:
    """Case-insensitive wildcard match (the reference lowercases both sides,
    permission_relationships.py:25-60)."""
    return F.like(F.lower(value), F.lower(wildcard_to_like(pattern)))


def evaluate_policy_grid(
    names: DataFrame,
    statements: DataFrame,
    name_col: str = "name",
    pattern_col: str = "pattern",
    effect_col: str = "effect",
) -> DataFrame:
    """For every name: allowed iff >=1 Allow statement matches and no Deny
    statement matches (explicit deny wins — :157-181). ``statements`` is a
    small dim -> broadcast; the match is a theta join on LIKE."""
    s = F.broadcast(statements.select(pattern_col, effect_col))
    m = names.join(s, wildcard_match(F.col(name_col), F.col(pattern_col)), "left")
    return (
        m.groupBy(name_col)
        .agg(
            (
                (F.count(F.when(F.col(effect_col) == "Allow", 1)) > 0)
                & (F.count(F.when(F.col(effect_col) == "Deny", 1)) == 0)
            ).alias("allowed")
        )
    )
