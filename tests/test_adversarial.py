"""Adversarial-fixture oracle replay (SURVEY.md §5 hardening).

The driver's synthetic documents are uniform word soup: never NULL, never
empty, never unicode, never containing markup or regex metacharacters. Any
cross-engine divergence on those classes (NULL-propagation differences,
code-point vs byte length, regex dialect corners) would ship invisibly.

This module rebuilds the documents table from a hostile row set — NULL
text, empty string, whitespace-only, NFC vs NFD unicode, emoji + CJK,
genuine markdown (so synthesized markup NESTS), regex metacharacters, a
very long document — alongside the untouched sf0.001 companions, and
replays a panel of document-path operators through the exact driver
comparator (oracle.check_query). An operator is allowed to DEFINE any
semantics for these rows, but both engines must agree on it.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from air_quality_data_pipeline_spark.oracle import TABLE_NAMES, check_query
from air_quality_data_pipeline_spark.registry import load_all_queries

SPECS = load_all_queries()

_ADV_TEXTS = [
    None,                                   # NULL text
    "",                                     # empty
    "x",                                    # single char (no bigrams)
    "   ",                                  # whitespace only
    "café münü nfc",         # NFC-composed accents
    "café münü nfd",      # NFD-decomposed same letters
    "你好\U0001f30d world mix",     # CJK + astral-plane emoji
    "word " * 2000 + "tail",                # very long document
    "a\nb\tc\r\nd",                         # embedded control whitespace
    "# real header\n**already bold** [pre](http://pre.example/x) body",
    "a*b[c](d)\\e ^$.|?+ literal metachars",
    "plain control document for baseline behavior",
]


@pytest.fixture(scope="module")
def adv_dir(spark):
    """Fixture dir: hostile documents.parquet + sf0.001 companions."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = "/tmp/adv_fixture"
    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        if name == "documents":
            continue
        target = os.path.join(dst, f"{name}.parquet")
        if not os.path.exists(target):
            shutil.copyfile(os.path.join(src, f"{name}.parquet"), target)
    rows = {
        "doc_id": list(range(len(_ADV_TEXTS))),
        "text": _ADV_TEXTS,
        "lang": [["en", "de", "zh"][i % 3] for i in range(len(_ADV_TEXTS))],
        "source": [f"adv{i % 4}" for i in range(len(_ADV_TEXTS))],
        "n_chars": [len(t) if t is not None else None for t in _ADV_TEXTS],
    }
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), os.path.join(dst, "documents.parquet"))
    return dst


# Document-path operators whose semantics the hostile rows can reach.
# Exclusions are deliberate and documented:
# - llm_winsorize / llm_token_budget aggregate n_chars only (NULL rows
#   drop identically) — covered by the normal oracle; nothing text-shaped
#   to attack.
# - similarity/embedding ops never read documents.text.
ADV_PANEL = [
    "llm_markup_strip",      # synthesized markup NESTS with real markdown
    "llm_url_extract",       # pre-existing URL in text joins the synthesized ones
    "llm_char_bigram_entropy",
    "f_codec",               # unicode → byte-level base64/hex
    "f_checksum",
    "llm_exact_dedup",
    "llm_text_stats",
    "llm_token_count",
    "llm_lang_id",
    "llm_quality_score",
    "llm_fingerprint",
    "llm_line_dedup",
    "llm_sentence_split",
    "llm_char_entropy",
    "llm_text_normalize",    # NFC vs NFD is this operator's whole job
    "llm_sft_format",
    "llm_doc_chunk",
    "llm_dataset_diff",
]


@pytest.mark.parametrize("name", ADV_PANEL)
def test_adversarial_oracle_match(spark, adv_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    problems = check_query(spec.builder(spark, adv_dir), spec.oracle, adv_dir)
    assert not problems, f"{name} diverges on hostile rows: {problems[:3]}"
