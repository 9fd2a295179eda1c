"""Offline cross-validation of CharTokenizer against transformers'
BertJapaneseTokenizer (VERDICT r4 #5).

The reference's black-box engine decodes with the upstream checkpoint's
tokenizer — a character-level BertJapaneseTokenizer (vocab.txt, ids are
line numbers, specials [PAD]=0 [UNK]=1 [CLS]=2 [SEP]=3 [MASK]=4; the
black-box decode happens inside the per-crop call at
/root/reference/src/ui/main_window.py:9801).  The hub download itself is
network-blocked here, but the installed transformers provides the SAME
tokenizer class: build it from the vocab.txt the synthetic CharTokenizer
writes and assert encode/decode/special-id agreement, shrinking the
"verify against upstream" flag to the download alone.
"""

import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from manga_ocr_tpu.models.tokenizer import CharTokenizer, h2z, post_process


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """(CharTokenizer, BertJapaneseTokenizer) built from one vocab.txt."""
    ours = CharTokenizer.synthetic()
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(ours.id_to_token) + "\n", encoding="utf-8")
    theirs = transformers.BertJapaneseTokenizer(
        vocab_file=str(path),
        word_tokenizer_type="basic",
        subword_tokenizer_type="character",
    )
    return ours, theirs


def test_special_token_ids_agree(pair):
    ours, theirs = pair
    assert ours.pad_id == theirs.pad_token_id == 0
    assert ours.unk_id == theirs.unk_token_id == 1
    assert ours.cls_id == theirs.cls_token_id == 2
    assert ours.sep_id == theirs.sep_token_id == 3


TEXTS = [
    "こんにちは",
    "バカヤロー！",
    "そうだね。",
    "え、なに？",  # fullwidth ？ NFKC-folds to ? on encode (both sides)
    "ツッコミ・ボケ",
    "ドーーーン",
    "あ いう　え",  # whitespace (incl. fullwidth) never becomes a token
    "Ｗｏｗ！",  # fullwidth Latin folds to ASCII on encode
]


@pytest.mark.parametrize("text", TEXTS)
def test_encode_agrees(pair, text):
    ours, theirs = pair
    assert ours.encode(text) == theirs(text)["input_ids"]


@pytest.mark.parametrize("text", TEXTS)
def test_decode_agrees(pair, text):
    """Upstream decodes with skip_special_tokens=True (space-joined chars)
    then post_process strips whitespace — the composed result must equal
    this repo's decode()."""
    ours, theirs = pair
    ids = ours.encode(text)
    upstream_text = post_process(theirs.decode(ids, skip_special_tokens=True))
    assert ours.decode(ids) == upstream_text


def test_unknown_char_maps_to_unk(pair):
    ours, theirs = pair
    text = "あ☃い"  # snowman is not in the vocab
    assert ours.encode(text) == theirs(text)["input_ids"]
    assert ours.unk_id in ours.encode(text)


def test_decode_batch_matches_row_by_row(pair):
    ours, theirs = pair
    rows = [ours.encode(t) for t in TEXTS[:3]]
    width = max(len(r) for r in rows)
    mat = np.zeros((len(rows), width), np.int32)
    lengths = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        mat[i, : len(r)] = r
        lengths[i] = len(r)
    batch = ours.decode_batch(mat, lengths)
    for i, t in enumerate(TEXTS[:3]):
        assert batch[i] == post_process(
            theirs.decode(rows[i], skip_special_tokens=True)
        )


# ---------------------------------------------------------------------------
# post_process property tests against documented upstream behavior
# (upstream manga_ocr: strip all whitespace; "…" -> "..."; runs of [・.]
# collapse to dots of the same length; then jaconv.h2z with
# ascii+digit+kana LAST — so the dots, like all ASCII, end up fullwidth)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("こ ん\tに\nち は", "こんにちは"),
        ("…", "．．．"),
        ("……", "．．．．．．"),
        ("・・・", "．．．"),
        ("。。。", "。。。"),  # only ・ and . are dot-run characters
        ("え!?", "え！？"),
        ("abc123", "ａｂｃ１２３"),
        ("ｶﾞｷﾞｸﾞ", "ガギグ"),
        ("ﾊﾟﾝﾁ", "パンチ"),
        ("ｱｲｳｴｵ", "アイウエオ"),
    ],
)
def test_post_process_upstream_properties(raw, expected):
    assert post_process(raw) == expected


def test_h2z_mixed_dot_run_length_preserved():
    # a mixed ・/. run keeps its character count, as (fullwidth) dots
    assert post_process("あ・.・い") == "あ．．．い"


def test_h2z_leaves_fullwidth_untouched():
    s = "ガンバレ！１２３ＡＢＣ"
    assert h2z(s) == s
