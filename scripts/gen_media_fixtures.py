"""Regenerate the committed tiny media binaries under tests/fixtures/media/.

The fixtures are deterministic (encode_text uses gzip mtime=0), so rerunning
this script must be a no-op diff; tests pin their sha256 digests.
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from address_parser_spark.operators.multimodal import (  # noqa: E402
    encode_gif,
    encode_jpeg,
    encode_png,
    encode_text,
    encode_wav,
)

TEXT = "Địa chỉ: Số 1 Lê Lợi, Phường Bến Nghé, Quận 1, TP. Hồ Chí Minh"

FIXTURES = {
    "tiny.png": encode_png(5, 3),
    "tiny.gif": encode_gif(7, 4),
    "tiny.jpg": encode_jpeg(9, 6),
    "tiny.wav": encode_wav(8000, 16),
    "tiny.txt.zlib": encode_text(TEXT, "zlib"),
    "tiny.txt.gz": encode_text(TEXT, "gzip"),
    "tiny.txt": encode_text(TEXT, "none"),
}


def main() -> None:
    out_dir = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "media"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, payload in FIXTURES.items():
        (out_dir / name).write_bytes(payload)
        print(f"{name}: {len(payload)} bytes sha256={hashlib.sha256(payload).hexdigest()}")


if __name__ == "__main__":
    main()
