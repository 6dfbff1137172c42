"""CLI verbs end-to-end (reference ``src/main.rs`` behaviours)."""

import io
import os
import wave

import numpy as np
import pytest

from zebra_tpu.cli import main


@pytest.fixture(autouse=True)
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    yield tmp_path


def test_text_insert_query_clear(capsys):
    db = "t.zebra"
    assert main(["--database-path", db, "text", "insert", "apple pie recipe", "rocket science"]) == 0
    out = capsys.readouterr().out
    assert "Inserted 2" in out
    assert main(["--database-path", db, "text", "query", "apple pie recipe", "-n", "1"]) == 0
    out = capsys.readouterr().out
    assert "apple pie recipe" in out
    assert main(["--database-path", db, "text", "clear"]) == 0
    assert not os.path.exists(db)


def test_text_insert_from_files(tmp_path, capsys):
    files = []
    for i in range(7):
        p = tmp_path / f"f{i}.txt"
        p.write_text(f"file content number {i}")
        files.append(str(p))
    assert main(["--database-path", "f.zebra", "text", "insert-from-files", *files,
                 "--batch-size", "3"]) == 0
    out = capsys.readouterr().out
    assert "Inserted 7" in out
    assert main(["--database-path", "f.zebra", "text", "query", "file content number 3"]) == 0
    out = capsys.readouterr().out
    assert "file content number" in out


def test_stats_verb(capsys):
    import json

    db = "st.zebra"
    main(["--database-path", db, "text", "insert", "alpha", "beta"])
    capsys.readouterr()
    assert main(["--database-path", db, "text", "stats"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["records"] == 2
    assert info["config"]["dim"] == 384
    assert info["index"]["built"] is True


def test_query_empty_database(capsys):
    assert main(["--database-path", "e.zebra", "text", "query", "nothing"]) == 0
    assert "empty" in capsys.readouterr().out.lower()


@pytest.mark.slow
def test_audio_roundtrip(tmp_path, capsys):
    rate = 16000
    t = np.arange(rate // 2) / rate
    p = tmp_path / "tone.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16).tobytes())
    db = "a.zebra"
    assert main(["--database-path", db, "audio", "insert", str(p)]) == 0
    out_dir = str(tmp_path / "out")
    assert main(["--database-path", db, "audio", "query", str(p), "--output-dir", out_dir]) == 0
    out = capsys.readouterr().out
    assert "bytes" in out
    assert os.listdir(out_dir)


def test_audio_query_play_flag(tmp_path, monkeypatch, capsys):
    """--play routes hits through the system player (rodio parity,
    main.rs:271-293); without a player it degrades with a message."""
    import io
    import wave as wavmod

    import numpy as np

    from zebra_tpu import cli

    # build a tiny wav
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((np.sin(np.arange(4000) * 0.3) * 3000).astype("<i2").tobytes())
    p = tmp_path / "t.wav"
    p.write_bytes(buf.getvalue())

    monkeypatch.chdir(tmp_path)
    assert cli.main(["--database-path", "a.zebra", "audio", "insert", str(p)]) == 0
    played = []
    monkeypatch.setattr(cli, "_play_audio", lambda doc: played.append(len(doc)) or None)
    assert cli.main(["--database-path", "a.zebra", "audio", "query", str(p), "--play"]) == 0
    assert played and played[0] == len(buf.getvalue())


def test_play_audio_no_player(monkeypatch):
    import shutil

    from zebra_tpu import cli

    monkeypatch.setattr(shutil, "which", lambda name: None)
    err = cli._play_audio(_wav_blob())
    assert "no system audio player" in err


def test_play_audio_decode_failure_reported():
    from zebra_tpu import cli

    err = cli._play_audio(b"definitely not audio")
    assert err is not None and err.startswith("decode:")


def _wav_blob(freq=440.0):
    import io
    import wave as _wave

    import numpy as np

    rate = 8000
    t = np.arange(rate) / rate
    pcm = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_play_audio_transcodes_compressed_blobs(monkeypatch):
    """A stored mp3 must reach the player as decodable PCM WAV (rodio
    parity: the reference decodes any codec before its sink)."""
    import shutil
    import subprocess
    import wave as _wave

    from zebra_tpu import cli

    pytest.importorskip("pygame")
    import os

    import pygame.examples

    p = os.path.join(os.path.dirname(pygame.examples.__file__), "data",
                     "house_lo.mp3")
    if not os.path.exists(p):
        pytest.skip("pygame sample absent")
    captured = {}

    def fake_run(cmd, **kw):
        with _wave.open(cmd[1]) as w:
            captured["rate"] = w.getframerate()
            captured["frames"] = w.getnframes()
        return None

    monkeypatch.setattr(shutil, "which",
                        lambda name: "/usr/bin/aplay" if name == "aplay" else None)
    monkeypatch.setattr(subprocess, "run", fake_run)
    with open(p, "rb") as f:
        assert cli._play_audio(f.read()) is None
    assert captured["rate"] > 0 and captured["frames"] > captured["rate"]
