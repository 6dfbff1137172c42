"""Command-line interface.

Mirrors the reference clap tree (``src/main.rs:30-139``):

  zebra-tpu text  {insert, insert-from-files, query, clear}
  zebra-tpu image {insert, query, clear}
  zebra-tpu audio {insert, query, clear}

with a global ``--database-path``, batch ingest (``--batch-size``, default 100
as in ``main.rs:80-81``), ``--number-of-results`` (default 1, ``main.rs:85-87``)
and wall-clock timing prints (reference uses ``ticky`` stopwatches,
``main.rs:146,153-160``). Terminal image rendering / audio playback
(viuer/rodio) are replaced by ``--output-dir`` extraction of retrieved blobs.
"""

from __future__ import annotations

import argparse
import os
import sys

from zebra_tpu.utils import Stopwatch


def _progress(i: int, total: int) -> None:
    width = 30
    done = int(width * i / max(total, 1))
    sys.stderr.write(f"\r[{'#' * done}{'.' * (width - done)}] {i}/{total}")
    if i == total:
        sys.stderr.write("\n")
    sys.stderr.flush()


def _open_db(modality: str, path: str):
    from zebra_tpu import defaults

    factory = {"text": defaults.text_db, "image": defaults.image_db, "audio": defaults.audio_db}
    db = factory[modality](path)
    _warn_degraded(db)
    return db


def _warn_degraded(db) -> None:
    """Print embedding-path degradations LOUDLY (stderr) — a user must not
    mistake hash-tokenizer / random-init results for semantic search."""
    try:
        status = db.model_status()
    except Exception:
        return
    for d in status.get("degradations", []):
        sys.stderr.write(f"WARNING: {status.get('model')}: {d}\n")
    if status.get("degradations"):
        sys.stderr.write(
            "WARNING: results will NOT be semantic until the above is fixed.\n"
        )
        sys.stderr.flush()


def _cmd_insert(args) -> int:
    db = _open_db(args.modality, args.database_path)
    if args.modality == "text":
        docs = [t.encode() for t in args.items]
    else:
        docs = [open(p, "rb").read() for p in args.items]
    sw = Stopwatch()
    ids = db.insert_documents(docs)
    print(f"Inserted {len(ids)} {args.modality} document(s) "
          f"({db.config.dim}-dimensional embeddings) in {sw.pretty()}.")
    return 0


def _read_files_parallel(paths: list[str]) -> list[bytes]:
    """Read ingest files with an I/O thread pool (the reference reads them
    with rayon's par_iter, ``main.rs:331-334``; Python file reads release
    the GIL, so threads overlap the disk waits)."""
    if len(paths) < 4:
        return [open(p, "rb").read() for p in paths]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(paths))) as pool:
        return list(pool.map(lambda p: open(p, "rb").read(), paths))


def _cmd_insert_from_files(args) -> int:
    db = _open_db(args.modality, args.database_path)
    paths = list(args.items)
    sw = Stopwatch()
    docs = _read_files_parallel(paths)  # all upfront, like the reference
    total = 0
    for start in range(0, len(docs), args.batch_size):
        batch = docs[start : start + args.batch_size]
        batch_sw = Stopwatch()
        db.insert_documents(batch)
        total += len(batch)
        _progress(total, len(docs))
        print(f"  batch of {len(batch)} in {batch_sw.pretty()}", file=sys.stderr)
    print(f"Inserted {total} document(s) from files in {sw.pretty()}.")
    return 0


def _cmd_query(args) -> int:
    db = _open_db(args.modality, args.database_path)
    if args.modality == "text":
        queries = [t.encode() for t in args.items]
    else:
        queries = [open(p, "rb").read() for p in args.items]
    sw = Stopwatch()
    results = db.query_documents(queries, number_of_results=args.number_of_results)
    elapsed = sw.pretty()
    if not results:
        print("Database is empty; no results.")
        return 0
    for qi in sorted(results):
        print(f"Query {qi}:")
        for doc_id, doc in results[qi].items():
            if args.modality == "text":
                text = doc.decode("utf-8", errors="replace")
                print(f"  [{doc_id.hex()[:12]}] {text}")
            else:
                print(f"  [{doc_id.hex()[:12]}] {len(doc)} bytes")
                if args.modality == "image" and getattr(args, "preview", False):
                    # inline terminal render — the reference's viuer parity
                    # (main.rs:217-247) for sixel-capable terminals
                    try:
                        from zebra_tpu.sixel import sixel_encode

                        sys.stdout.write(sixel_encode(doc) + "\n")
                    except Exception as e:  # corrupt blob / no PIL decode
                        print(f"    (preview failed: {e})")
                if args.modality == "audio" and getattr(args, "play", False):
                    # speaker playback — the reference's rodio parity
                    # (main.rs:271-293) via the system player
                    err = _play_audio(doc)
                    if err:
                        print(f"    (playback unavailable: {err}; "
                              f"use --output-dir to extract)")
                if args.output_dir:
                    os.makedirs(args.output_dir, exist_ok=True)
                    out = os.path.join(args.output_dir, f"{doc_id.hex()}.bin")
                    with open(out, "wb") as f:
                        f.write(doc)
                    print(f"    -> {out}")
    print(f"Queried {len(queries)} {args.modality} document(s) in {elapsed}.")
    return 0


def _play_audio(doc: bytes) -> str | None:
    """Play one retrieved audio blob through the first available system
    player (the reference plays every result with rodio before returning,
    ``main.rs:271-293``). The blob is decoded through the full codec chain
    and re-rendered as PCM WAV first, so stored mp3/flac/aac/... play just
    like rodio's symphonia-backed sink — aplay alone only accepts WAV.
    Returns an error string when decode or every player fails."""
    import io
    import shutil
    import struct
    import subprocess
    import tempfile

    try:
        from zebra_tpu.models.audio import audio_to_data

        samples, rate = audio_to_data(doc)
        import numpy as np

        pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        wav = io.BytesIO()
        import wave as _wave

        with _wave.open(wav, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm)
        payload = wav.getvalue()
    except Exception as e:
        return f"decode: {e}"

    for player in ("aplay", "paplay", "afplay"):
        path = shutil.which(player)
        if not path:
            continue
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(payload)
            f.flush()
            try:
                subprocess.run([path, f.name], check=True, timeout=300,
                               capture_output=True)
                return None
            except Exception as e:
                return f"{player}: {e}"
    return "no system audio player (aplay/paplay/afplay) on PATH"


def _cmd_clear(args) -> int:
    db = _open_db(args.modality, args.database_path)
    db.clear_database()
    print(f"Cleared {args.modality} database at {args.database_path}.")
    return 0


def _cmd_stats(args) -> int:
    import json

    db = _open_db(args.modality, args.database_path)
    info = {
        "records": len(db),
        "config": db.config.to_json(),
        "index": db.index.stats(),
        "model": db.model_status(),
    }
    print(json.dumps(info, indent=2))
    return 0


def _cmd_fetch_weights(args) -> int:
    """Runtime weight acquisition (≙ the reference's first-use downloads:
    fastembed ``model/text.rs:15-17``, candle hf-hub ``model/image.rs:60-64``).
    Explicit here — a database open never touches the network."""
    from zebra_tpu.models import fetch

    models = ["bge-small", "vit"] if args.model == "all" else [args.model]
    for m in models:
        try:
            dest = fetch.fetch(m)
        except RuntimeError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(f"Fetched {m} weights into {dest}.")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="zebra-tpu",
        description="TPU-native embedded vector database (text / image / audio).",
    )
    ap.add_argument(
        "--database-path",
        default="zebra.db",
        help="path to the database manifest file (default: zebra.db)",
    )
    sub = ap.add_subparsers(dest="modality", required=True)
    for modality in ("text", "image", "audio"):
        m = sub.add_parser(modality)
        verbs = m.add_subparsers(dest="verb", required=True)

        ins = verbs.add_parser("insert", help="insert documents")
        ins.add_argument("items", nargs="+",
                         help="texts (text) or file paths (image/audio)")
        ins.set_defaults(fn=_cmd_insert)

        iff = verbs.add_parser("insert-from-files", help="batch ingest files")
        iff.add_argument("items", nargs="+", help="file paths")
        iff.add_argument("--batch-size", type=int, default=100)
        iff.set_defaults(fn=_cmd_insert_from_files)

        q = verbs.add_parser("query", help="query nearest documents")
        q.add_argument("items", nargs="+",
                       help="query texts (text) or file paths (image/audio)")
        q.add_argument("--number-of-results", "-n", type=int, default=1)
        q.add_argument("--output-dir", default="",
                       help="write retrieved image/audio blobs here")
        if modality == "image":
            q.add_argument("--preview", action="store_true",
                           help="render hits inline (sixel terminals)")
        if modality == "audio":
            q.add_argument("--play", action="store_true",
                           help="play hits through the system audio player")
        q.set_defaults(fn=_cmd_query)

        c = verbs.add_parser("clear", help="delete the database")
        c.set_defaults(fn=_cmd_clear)

        st = verbs.add_parser("stats", help="print database/index statistics")
        st.set_defaults(fn=_cmd_stats)

    fw = sub.add_parser(
        "fetch-weights",
        help="download model weights into the local cache (hf-hub); "
        "afterwards text/image search is semantic with zero env vars",
    )
    fw.add_argument("model", choices=["bge-small", "vit", "all"])
    fw.set_defaults(fn=_cmd_fetch_weights, verb="fetch-weights")
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: {e.filename or e}: no such file", file=sys.stderr)
        return 1
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
