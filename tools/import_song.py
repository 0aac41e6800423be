"""One-time import: parse the reference's Bach tracker text into event arrays.

Produces zang_tpu/data/bach_toccata.npz with per-instrument event arrays
(t, note_id, freq, note_on) — the parsed form of the public-domain Bach
Toccata & Fugue tracker transcription. Run from the repo root:

    python tools/import_song.py [path-to-example_song.txt]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zang_tpu.host.songparse import parse_song  # noqa: E402

COLUMNS_PER_VOICE = [2, 8, 2]  # Pedal, RegularOrgan, WeirdOrgan


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/example_song.txt"
    with open(src) as f:
        contents = f.read()
    events = parse_song(contents, COLUMNS_PER_VOICE, note_duration=0.15, a4=440.0)
    out = {}
    for i, ev in enumerate(events):
        out[f"t_{i}"] = np.array([e.t for e in ev], dtype=np.float32)
        out[f"id_{i}"] = np.array([e.note_id for e in ev], dtype=np.int64)
        out[f"freq_{i}"] = np.array([e.params["freq"] for e in ev], dtype=np.float32)
        out[f"on_{i}"] = np.array([e.params["note_on"] for e in ev], dtype=bool)
        print(f"instrument {i}: {len(ev)} events, "
              f"t span [{out[f't_{i}'][0]:.2f}, {out[f't_{i}'][-1]:.2f}]s")
    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "zang_tpu", "data", "bach_toccata.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **out)
    print("wrote", dst)


if __name__ == "__main__":
    main()
