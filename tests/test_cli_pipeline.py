"""Full CLI curriculum pipeline (VERDICT round-1 item 1 'Done' criteria):
imitation training via the CLI → checkpoint on disk → a
`federer_train_stage_1` run that discovers and embeds the frozen low-level
policy, then an eval with rendered output.
"""

import json
import os

import numpy as np
import pytest

from vid2player3d_tpu.cli.run import main


@pytest.mark.slow
def test_cli_im_then_tennis_with_pi_low(tmp_path, capsys):
    out = str(tmp_path)
    im_out = os.path.join(out, "federer_im")
    # tiny low-level imitation training run
    rc = main(["--cfg", "federer_im", "--num_envs", "8", "--horizon", "4",
               "--minibatch_size", "16", "--epochs", "2", "--seed", "1",
               "--out", im_out])
    assert rc == 0
    assert os.path.exists(os.path.join(im_out, "best.npz"))
    assert os.path.exists(os.path.join(im_out, "metrics.jsonl"))

    # high-level stage 1 discovers the checkpoint and embeds pi_low
    rc = main(["--cfg", "federer_train_stage_1", "--num_envs", "8",
               "--horizon", "4", "--minibatch_size", "16", "--epochs", "2",
               "--seed", "1", "--out", out])
    assert rc == 0
    text = capsys.readouterr().out
    assert "embedding frozen low-level policy" in text
    rows = [json.loads(l) for l in
            open(os.path.join(out, "metrics.jsonl"))]
    assert len(rows) == 2
    assert np.isfinite(rows[-1]["reward_mean"])

    # eval + watchable rollout from the trained stage
    html = os.path.join(out, "roll.html")
    rc = main(["--cfg", "federer_train_stage_1", "--num_envs", "4",
               "--test", "--epochs", "1", "--seed", "1", "--out", out,
               "--render", html])
    assert rc == 0
    assert os.path.exists(html)
