"""End-to-end golden regression: the full pipeline's output on a fixed
scene with seeded weights must match the checked-in artifact.

This is the automated version of the reference's manual regression habit
(re-running depth_visualize.py on assets/cats.jpg and eyeballing the map,
reference depth_visualize.py:1459-1492): any unintended numerical change
in preprocess, the model, depth post, the DIBR kernel, or compose shows up
as a diff against assets/golden_sbs.npz.  Tolerances absorb benign float
reassociation across XLA versions; structural changes blow well past them.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "golden_sbs.npz")


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="golden artifact missing (assets/make_golden_sbs.py)")
def test_pipeline_matches_golden_artifact():
    from assets.make_golden_sbs import generate

    golden = np.load(ARTIFACT)
    frame, sbs, depth = generate()

    assert np.array_equal(frame, golden["frame"]), "input scene changed"
    # u8 output: allow a few LSBs of reassociation drift on a small fraction
    diff = np.abs(sbs.astype(np.int32) - golden["sbs"].astype(np.int32))
    assert diff.max() <= 3, f"sbs drift: max {diff.max()}"
    assert (diff > 1).mean() < 0.01, f"sbs drift: {(diff > 1).mean():.2%} px"
    # depth in [0,1], stored f16
    ddiff = np.abs(depth - golden["depth"].astype(np.float32))
    assert ddiff.max() < 5e-3, f"depth drift: max {ddiff.max():.2e}"
