#!/bin/bash
# Re-run the strike-inception pipeline's translation + RL stages with the
# grad-clipped trainer config (examples/strike_inception_demo.py now sets
# grad_clip_norm=1.0 — the first full run trained unclipped and hit
# recurring Adam loss spikes on the random-backbone features). Demo videos
# and cached Mixed_7c features are kept; only the model and RL legs rerun.
cd "$(dirname "$0")/.."
R=examples/results/strike_inception_demo
rm -rf "$R/translation" "$R/rl" "$R/summary.json"
exec python examples/strike_inception_demo.py
