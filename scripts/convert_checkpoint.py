"""One-shot converter: HF manga-ocr checkpoint dir -> native npz checkpoint.

Usage: python scripts/convert_checkpoint.py /path/to/hf_dir /path/to/out_dir
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    from manga_ocr_tpu.models.checkpoint import save_checkpoint
    from manga_ocr_tpu.models.convert import load_hf_checkpoint

    params, cfg = load_hf_checkpoint(src)
    save_checkpoint(dst, params, cfg)
    vocab = os.path.join(src, "vocab.txt")
    if os.path.exists(vocab):
        import shutil

        shutil.copy(vocab, os.path.join(dst, "vocab.txt"))
    print(f"converted {src} -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
