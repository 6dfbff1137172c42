"""Multimodal databases side by side (BASELINE config 4 shape).

Text, image and audio databases with the reference's default pairings —
the reference's multimodal story is exactly this trio of typed databases
(`DefaultTextDatabase` / `DefaultImageDatabase` / `DefaultAudioDatabase`).

Run: python examples/multimodal.py  (uses offline random-init towers; real
weights load from local checkpoints via ZEBRA_TPU_VIT_WEIGHTS /
ZEBRA_TPU_BGE_WEIGHTS when available)
"""

import io
import os
import tempfile
import wave

import numpy as np

import zebra_tpu as z


def png(rng, hue):
    from PIL import Image

    arr = np.zeros((64, 64, 3), np.uint8)
    arr[..., hue] = (rng.random((64, 64)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def tone(freq, rate=16000, seconds=0.25):
    t = np.arange(int(rate * seconds)) / rate
    samples = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def main():
    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)

    tdb = z.text_db(os.path.join(tmp, "text.zebra"))
    idb = z.image_db(os.path.join(tmp, "image.zebra"))
    adb = z.audio_db(os.path.join(tmp, "audio.zebra"))

    tdb.insert_documents([b"a red fox", b"a blue whale", b"a green tree"])
    images = [png(rng, c) for c in (0, 1, 2)]
    idb.insert_documents(images)
    tones = [tone(f) for f in (220.0, 440.0, 880.0)]
    adb.insert_documents(tones)

    print("text:",  [d for d in tdb.query_documents([b"a red fox"], 1)[0].values()])
    hit = idb.query_documents([images[1]], 1)[0]
    print("image self-match bytes:", [len(v) for v in hit.values()])
    hit = adb.query_documents([tones[2]], 1)[0]
    print("audio self-match bytes:", [len(v) for v in hit.values()])


if __name__ == "__main__":
    main()
