"""CLI / config layer (reference L9: `embodied_pose/run.py`, `vid2player/run.py`,
`*/utils/config.py`, YAML trees in `*/cfg/`).

Usage mirrors the reference commands:

    python -m vid2player3d_tpu --cfg amass_im                    # low-level stage 1
    python -m vid2player3d_tpu --cfg djokovic_im --checkpoint ck # stage 2 fine-tune
    python -m vid2player3d_tpu --cfg federer_train_stage_1       # high-level stage 1
    python -m vid2player3d_tpu --cfg federer --test              # inference/eval
    python -m vid2player3d_tpu --cfg mvae_federer                # MVAE training
"""

from vid2player3d_tpu.cli.configs import CONFIGS, RunConfig, get_config
from vid2player3d_tpu.cli.run import main

__all__ = ["CONFIGS", "RunConfig", "get_config", "main"]
