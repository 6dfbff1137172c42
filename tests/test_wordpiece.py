"""Golden tests for the vendored WordPiece/BERT tokenizer
(reference embeds through fastembed's bundled HF tokenizer,
``src/model/text.rs:15-24``; these pin exact-id behaviour)."""

import numpy as np
import pytest

from zebra_tpu.models.wordpiece import (
    BasicTokenizer,
    BertTokenizer,
    WordPieceTokenizer,
)

# a miniature BERT-style vocab: specials first, then words and pieces
_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "hello", "world", "un", "##aff", "##able", "!", ",", "runn", "##ing",
    "the", "cat", "深", "圳",
]


@pytest.fixture
def tok(tmp_path):
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(_VOCAB), encoding="utf-8")
    return BertTokenizer(str(path))


def test_basic_tokenizer_splits_punct_and_lowercases():
    bt = BasicTokenizer()
    assert bt.tokenize("Hello, WORLD!") == ["hello", ",", "world", "!"]


def test_basic_tokenizer_strips_accents_and_controls():
    bt = BasicTokenizer()
    assert bt.tokenize("héllo") == ["hello"]  # é -> e
    assert bt.tokenize("a\x00b�c") == ["abc"]  # NUL / replacement dropped


def test_basic_tokenizer_cjk_chars_split():
    bt = BasicTokenizer()
    assert bt.tokenize("深圳ok") == ["深", "圳", "ok"]


def test_wordpiece_greedy_longest_match():
    wp = WordPieceTokenizer({v: i for i, v in enumerate(_VOCAB)})
    assert wp.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert wp.tokenize("running") == ["runn", "##ing"]
    assert wp.tokenize("hello") == ["hello"]
    assert wp.tokenize("zzz") == ["[UNK]"]  # no piece matches
    assert wp.tokenize("x" * 200) == ["[UNK]"]  # over max_chars


def test_full_pipeline_golden_ids(tok):
    ids, attn = tok(["Hello, unaffable world!"], max_length=16)
    v = {t: i for i, t in enumerate(_VOCAB)}
    expect = [v["[CLS]"], v["hello"], v[","], v["un"], v["##aff"], v["##able"],
              v["world"], v["!"], v["[SEP]"]]
    np.testing.assert_array_equal(ids[0, : len(expect)], expect)
    assert attn[0, : len(expect)].all() and not attn[0, len(expect):].any()
    assert (ids[0, len(expect):] == v["[PAD]"]).all()


def test_truncation_keeps_cls_sep(tok):
    ids, attn = tok(["hello " * 50], max_length=8)
    assert ids[0, 0] == 2 and ids[0, 7] == 3  # [CLS] ... [SEP]
    assert attn[0].all()


@pytest.mark.slow
def test_wordpiece_matches_transformers_if_cached(tmp_path):
    """When a real HF tokenizer is available locally, our vendored pipeline
    must produce identical ids on representative text."""
    transformers = pytest.importorskip("transformers")
    try:
        hf = transformers.AutoTokenizer.from_pretrained(
            "BAAI/bge-small-en-v1.5", local_files_only=True
        )
    except Exception:
        pytest.skip("no local HF tokenizer cache")
    vocab_file = hf.save_vocabulary(str(tmp_path))[0]
    ours = BertTokenizer(vocab_file)
    for text in [
        "Hello, world!", "The quick brown fox jumps over 12 lazy dogs.",
        "naïve café déjà-vu", "unbelievably counterproductive tokenization",
    ]:
        ref = hf(text, padding="max_length", truncation=True, max_length=32)
        ids, _ = ours([text], max_length=32)
        np.testing.assert_array_equal(ids[0], np.asarray(ref["input_ids"]))
