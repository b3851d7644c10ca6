"""Text expression helpers: tokenization and shingling, engine-portable.

Used by the dedup/similarity/text-analysis operators. Both the Spark and the
DuckDB fragments compute identical values — whitespace tokens and n-token
shingles with pure string/array built-ins.
"""

from __future__ import annotations

# --- Spark SQL fragments ----------------------------------------------------


def tokens_spark(text_col: str) -> str:
    return f"split({text_col}, ' ')"


def shingles_spark(tokens_col: str, n: int = 3) -> str:
    """array<string> tokens → array of n-token shingles (space-joined)."""
    parts = ", ".join(f"element_at({tokens_col}, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size({tokens_col}) >= {n} THEN "
        f"transform(sequence(1, size({tokens_col}) - {n - 1}), i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def drop_last_token_spark(text_col: str) -> str:
    """Rebuild the text without its final token (used to synthesize near-dups)."""
    t = f"split({text_col}, ' ')"
    return f"concat_ws(' ', slice({t}, 1, size({t}) - 1))"


# --- DuckDB fragments (identical values) -------------------------------------


def tokens_duckdb(text_col: str) -> str:
    return f"string_split({text_col}, ' ')"


def shingles_duckdb(tokens_col: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"{tokens_col}[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({tokens_col}) - {n - 1}, 0) + 1), "
        f"i -> {parts})"
    )


def drop_last_token_duckdb(text_col: str) -> str:
    t = f"string_split({text_col}, ' ')"
    return f"array_to_string(list_slice({t}, 1, len({t}) - 1), ' ')"
