"""Web-text cleanup: HTML strip, entity decode, mojibake repair, control
chars, whitespace — the hygiene pass a web corpus gets before quality
filtering (reference consolidate_and_clean.py:31-58 normalizes whitespace
and drops empty docs; this module is the full web-grade superset).

Everything is a chain of JVM-native column expressions (regexp_replace /
replace) — zero UDFs, zero shuffles, text touched once per step inside a
single projection, so the stage pipelines with the scan at 100 TB and
whole-stage codegen fuses the chain into one pass per row batch.

Pipeline order (order is load-bearing, documented per step):
  1. newline normalization  — CRLF / lone CR -> LF (before control strip,
     which would otherwise eat the CR and fuse lines)
  2. script/style block removal — non-greedy, dotall, case-insensitive
     (before tag strip: their inner text must go with them)
  3. tag strip              — ``<[^>]*>`` -> single space (space, not
     empty: ``a</p><p>b`` must not fuse into ``ab``); naive by design —
     an unterminated ``<div`` survives, and a bare ``<`` in prose eats to
     the next ``>`` iff one exists (same trade as every regex cleaner)
  4. entity decode          — longest-first literal table, ``&amp;``
     strictly LAST so ``&amp;lt;`` decodes once to the literal ``&lt;``
     (HTML decode-once semantics), never twice to ``<``
  5. mojibake repair        — fixed table of unambiguous UTF-8-read-as-
     cp1252 sequences (ftfy's high-confidence subset); literal replaces
  6. control-char strip     — C0 controls except \\t \\n, plus DEL
  7. whitespace collapse    — runs of space/tab -> one space, spaces
     hugging a newline dropped, 3+ newlines -> 2, trim ends

The DuckDB twin (`oracle_clean_expr`) is generated from the SAME ordered
tables but re-expresses every regex step in RE2 syntax with DuckDB flag
options — engine-layer independence, shared vocabulary, the same policy
as spec.py's filter lexicons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: every pair is applied in sequence; &amp; MUST stay last (see
# module docstring step 4).
ENTITY_TABLE: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&amp;", "&"),
]

# Unambiguous UTF-8-bytes-decoded-as-cp1252 artifacts. Longest-first where
# prefixes overlap ("â€œ" before any shorter "â€" entry — none kept).
MOJIBAKE_TABLE: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€˜", "‘"),  # â€˜ -> ‘
    ("â€œ", "“"),  # â€œ -> “
    ("â€¦", "…"),  # â€¦ -> …
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Â ", " "),  # Â + nbsp -> space
]

# C0 controls minus \t(09) \n(0A); \r(0D) is normalized to \n in step 1,
# so the class may include it for any stray survivor; plus DEL(7F).
_CTRL_JAVA = r"[\x00-\x08\x0B-\x1F\x7F]"
_CTRL_RE2 = r"[\x00-\x08\x0B-\x1F\x7F]"


def clean_expr(col: Column) -> Column:
    """The full cleanup as one Spark column expression chain."""
    c = F.regexp_replace(col, r"\r\n?", "\n")
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for src, dst in ENTITY_TABLE + MOJIBAKE_TABLE:
        c = F.replace(c, F.lit(src), F.lit(dst))
    c = F.regexp_replace(c, _CTRL_JAVA, "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.trim(c)


def clean_web_text(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Append `out_col` (cleaned text) and `<out_col>_removed` (chars
    dropped by cleanup — the cheap per-doc dirt metric)."""
    cleaned = clean_expr(F.col(text_col))
    return df.withColumn(out_col, cleaned).withColumn(
        out_col + "_removed",
        (F.length(text_col) - F.length(out_col)).cast("long"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def oracle_clean_expr(expr: str) -> str:
    """DuckDB SQL expression applying the same pipeline to `expr`.

    RE2 differences handled here: flags go in the options argument
    ('g' global — Java regexp_replace is always-global — plus 'i'/'s'),
    and literal replaces use replace()."""
    c = f"regexp_replace({expr}, '\\r\\n?', chr(10), 'g')"
    c = f"regexp_replace({c}, '<script[^>]*>.*?</script>', ' ', 'gis')"
    c = f"regexp_replace({c}, '<style[^>]*>.*?</style>', ' ', 'gis')"
    c = f"regexp_replace({c}, '<[^>]*>', ' ', 'g')"
    for src, dst in ENTITY_TABLE + MOJIBAKE_TABLE:
        c = f"replace({c}, {_sql_quote(src)}, {_sql_quote(dst)})"
    c = f"regexp_replace({c}, '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g')"
    c = f"regexp_replace({c}, '[ \\t]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n ?', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"trim({c})"
