import numpy as np

from manga_ocr_tpu.models.tokenizer import CharTokenizer, h2z, post_process


def test_roundtrip():
    tok = CharTokenizer.synthetic()
    text = "こんにちは"
    ids = tok.encode(text)
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    assert tok.decode(ids) == text


def test_post_process_whitespace_and_ellipsis():
    assert post_process("こん に\tち　は") == "こんにちは"
    # Ellipsis / dot-run normalization happens before the final
    # halfwidth→fullwidth pass, so ASCII dots come out fullwidth (matching
    # jaconv.h2z(ascii=True) semantics used by the reference stack).
    assert post_process("あ…") == "あ．．．"
    assert post_process("あ・・・") == "あ．．．"
    assert post_process("あ..") == "あ．．"


def test_h2z_katakana_voiced():
    assert h2z("ｶﾞｷﾞｭｳ") == "ガギュウ"
    assert h2z("ﾊﾟﾝ") == "パン"
    assert h2z("abc123") == "ａｂｃ１２３"


def test_decode_batch_with_lengths():
    tok = CharTokenizer.synthetic()
    ids = tok.encode("アニメ")
    row = np.array(ids + [tok.pad_id] * 3)
    batch = np.stack([row, row])
    out = tok.decode_batch(batch, np.array([len(ids), len(ids)]))
    assert out == ["アニメ", "アニメ"]


def test_unknown_char_maps_to_unk():
    tok = CharTokenizer.synthetic()
    ids = tok.encode("")  # not in vocab
    assert tok.unk_id in ids
