"""BASELINE config 4 at its REAL shape: strike through Inception-v3 features.

Thin entry over ``exp.inception_pipeline.run_strike_inception`` with the
random-init backbone — no pretrained slim checkpoint exists in this image
(the converter + restore sanity check are proven against real TF1 Saver
files in tests/test_inception.py), so this run demonstrates the PIPELINE at
its real shape. ``strike_inception_selfsup.py`` runs the same pipeline with
an in-image self-supervised backbone for meaningful features; drop an
``inception_v3.npz`` into data/ and pass ``backbone_npz`` for the real thing.

Stages + throughput numbers land in examples/results/strike_inception_demo.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.exp.inception_pipeline import run_strike_inception

LOG = os.path.join(os.path.dirname(__file__), "results", "strike_inception_demo")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_striker")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

run_strike_inception(
    LOG,
    EXPERT,
    backbone_tag="randominit",
    notes_caveat="""
**Caveat — random-init backbone.** No pretrained slim checkpoint exists in this
image (converter + restore are proven in tests/test_inception.py). This run
therefore demonstrates the PIPELINE at its real shape, not feature-space
translation quality — see `strike_inception_selfsup/` for the in-image
self-supervised backbone run. Unnormalized, the random backbone's magnitudes
blow losses to ~1e22.
""",
)
