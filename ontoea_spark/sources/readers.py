"""File-format readers with the reference's cleanup semantics
(SURVEY.md §2.1 S1-S3; all JVM expressions — the parse happens inside
codegen, one narrow pass per file).

Input convention: a DataFrame with one string column ``value`` holding
raw lines (``spark.read.text`` shape), so the same parsers serve files,
test fixtures, and synthesized corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bracket_strip(tok: Column) -> Column:
    """filter_bracket (read.py:386-390): strip one <...> wrapper if the
    trimmed token has both brackets."""
    t = F.trim(tok)
    return F.when(
        t.startswith("<") & t.endswith(">"),
        t.substr(F.lit(2), F.length(t) - 2),
    ).otherwise(t)


def read_relation_triples(
    lines: DataFrame, bracket: bool = False, sep: str = r"\s+"
) -> DataFrame:
    """S1 (read.py:219-236): 3-column triple parse, optional bracket
    strip, set-dedup on read. Returns DataFrame[s, p, o]."""
    toks = F.split(F.trim(F.col("value")), sep)
    df = lines.select(toks.alias("t")).filter(F.size("t") >= 3)
    cols = [F.get("t", i) for i in range(3)]
    if bracket:
        cols = [_bracket_strip(c) for c in cols]
    return df.select(
        cols[0].alias("s"), cols[1].alias("p"), cols[2].alias("o")
    ).dropDuplicates()


def read_links(lines: DataFrame, sep: str = "\t") -> DataFrame:
    """S3 (read.py:239-257): 2-column link parse. DataFrame[e1, e2]."""
    toks = F.split(F.col("value"), sep)
    return (
        lines.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.trim(F.get("t", 0)).alias("e1"), F.trim(F.get("t", 1)).alias("e2")
        )
    )


def read_attribute_triples(lines: DataFrame) -> DataFrame:
    """S2 (read.py:393-424): whitespace split; lines with <3 tokens drop;
    head/attr/first-value-token bracket-stripped; tokens[3:] re-joined
    into the literal except bare '.' tokens; final literal
    strip -> rstrip('.') -> strip. Set semantics. DataFrame[e, a, v]."""
    toks = F.split(F.trim(F.col("value")), r"\s+")
    df = lines.select(toks.alias("t")).filter(F.size("t") >= 3)
    head = _bracket_strip(F.get("t", 0))
    attr = _bracket_strip(F.get("t", 1))
    v0 = _bracket_strip(F.get("t", 2))
    rest = F.filter(
        F.slice(F.col("t"), 4, F.greatest(F.size("t") - 3, F.lit(0))),
        lambda p: p != ".",
    )
    joined = F.concat_ws(" ", F.concat(F.array(v0), rest))
    value = F.trim(F.regexp_replace(F.trim(joined), r"\.+$", ""))
    return df.select(
        head.alias("e"), attr.alias("a"), value.alias("v")
    ).dropDuplicates()


# DuckDB oracle fragments -------------------------------------------------

BRACKET_STRIP_SQL = (
    "CASE WHEN trim({t}) LIKE '<%' AND trim({t}) LIKE '%>' "
    "THEN substr(trim({t}), 2, length(trim({t})) - 2) ELSE trim({t}) END"
)


def read_attribute_triples_sql(lines_expr: str) -> str:
    """DuckDB fragment: parse `value` lines per S2 semantics; yields
    (e, a, v). Use inside `SELECT DISTINCT e, a, v FROM (<this>)`."""
    b = BRACKET_STRIP_SQL
    return f"""
SELECT {b.format(t='t[1]')} AS e,
       {b.format(t='t[2]')} AS a,
       trim(regexp_replace(trim(
         array_to_string(
           list_prepend({b.format(t='t[3]')},
                        list_filter(t[4:], p -> p != '.')),
           ' ')), '\\.+$', '')) AS v
FROM (
  SELECT regexp_split_to_array(trim(value), '\\s+') AS t FROM ({lines_expr})
)
WHERE len(t) >= 3
"""
