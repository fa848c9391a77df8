"""docs/TUTORIAL.md must stay executable: every ```python block runs
in one shared namespace, in order, on CPU (the suite conftest forces
the cpu platform). Doc rot fails loudly here."""

import pathlib
import re

import numpy as np

DOC = pathlib.Path(__file__).resolve().parent.parent / "docs" / "TUTORIAL.md"


def test_tutorial_blocks_execute():
    blocks = re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)
    assert len(blocks) >= 8, "tutorial lost its code blocks"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"TUTORIAL.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"tutorial block {i} failed: {type(e).__name__}: {e}\n"
                f"---\n{block}") from e
    # the walkthrough's own claims hold
    freqs, psd = ns["freqs"], ns["psd"]
    assert abs(freqs[psd.argmax()] - 440.0) < 44100 / 1024
    H = np.asarray(ns["H"])
    w = ns["w"]
    fs = ns["fs"]
    band = np.abs(H[w < 2 * np.pi * 1000 / fs])
    stop = np.abs(H[w > 2 * np.pi * 8000 / fs])
    assert band.min() > 0.9 and stop.max() < 0.05
