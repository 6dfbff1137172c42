"""Sixel encoder: structure, palette bounds, losslessness of the bitplanes."""

import io

import numpy as np
import pytest

from zebra_tpu.sixel import sixel_encode


def _png(rng, w=30, h=14):
    from PIL import Image

    arr = np.zeros((h, w, 3), np.uint8)
    arr[:, : w // 2] = [255, 0, 0]
    arr[:, w // 2 :] = [0, 0, 255]
    arr[:3, :3] = (rng.random((3, 3, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue(), arr


def _decode(s: str):
    """Tiny reference decoder: replay the stream into an index raster."""
    assert s.startswith('\x1bPq"') and s.endswith("\x1b\\")
    body = s[len("\x1bPq") : -2]
    # raster attrs: "1;1;w;h
    import re

    m = re.match(r'"1;1;(\d+);(\d+)', body)
    w, h = int(m.group(1)), int(m.group(2))
    body = body[m.end():]
    img = np.zeros((h + 6, w), np.int32) - 1
    x = y = 0
    color = 0
    i = 0
    palette = {}
    while i < len(body):
        ch = body[i]
        if ch == "#":
            j = i + 1
            while j < len(body) and body[j].isdigit():
                j += 1
            idx = int(body[i + 1 : j])
            if j < len(body) and body[j] == ";":  # palette definition
                m2 = re.match(r";2;(\d+);(\d+);(\d+)", body[j:])
                palette[idx] = tuple(int(g) for g in m2.groups())
                i = j + m2.end()
            else:
                color = idx
                i = j
            continue
        if ch == "$":
            x = 0
            i += 1
            continue
        if ch == "-":
            x = 0
            y += 6
            i += 1
            continue
        if ch == "!":
            j = i + 1
            while body[j].isdigit():
                j += 1
            rep = int(body[i + 1 : j])
            bits = ord(body[j]) - 63
            for _ in range(rep):
                for b in range(6):
                    if bits >> b & 1:
                        img[y + b, x] = color
                x += 1
            i = j + 1
            continue
        bits = ord(ch) - 63
        assert 0 <= bits < 64, repr(ch)
        for b in range(6):
            if bits >> b & 1:
                img[y + b, x] = color
        x += 1
        i += 1
    return img[:h], palette, (w, h)


def test_sixel_roundtrip_exact(rng):
    from PIL import Image

    png, arr = _png(rng)
    s = sixel_encode(png)
    img, palette, (w, h) = _decode(s)
    assert (w, h) == (arr.shape[1], arr.shape[0])
    assert (img >= 0).all()  # every pixel painted exactly once overall
    # reconstruct RGB through the emitted palette and compare to PIL's own
    # adaptive quantisation of the source
    pal_img = Image.open(io.BytesIO(png)).convert("RGB").convert(
        "P", palette=Image.ADAPTIVE, colors=64
    )
    want = np.asarray(pal_img)
    np.testing.assert_array_equal(img, want)
    for idx, (r, g, b) in palette.items():
        assert 0 <= r <= 100 and 0 <= g <= 100 and 0 <= b <= 100


def test_sixel_downscales_large(rng):
    from PIL import Image

    arr = (rng.random((100, 800, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    s = sixel_encode(buf.getvalue(), max_width=320)
    _, _, (w, h) = _decode(s)
    assert w == 320 and h == 40


def test_cli_image_preview_flag(tmp_path, rng, monkeypatch, capsys):
    from PIL import Image

    from zebra_tpu import cli

    png, _ = _png(rng)
    p = tmp_path / "img.png"
    p.write_bytes(png)
    db = str(tmp_path / "img.zebra")
    assert cli.main(["--database-path", db, "image", "insert", str(p)]) == 0
    capsys.readouterr()
    assert cli.main([
        "--database-path", db, "image", "query", str(p), "--preview",
    ]) == 0
    out = capsys.readouterr().out
    assert "\x1bPq" in out and out.count("\x1b\\") == 1
