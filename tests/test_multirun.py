"""Multirun sweep: two jobs land in outputs/trials/<runNNN>/<subdir>."""

import pytest

from pixel_heal_thyself_tpu.train import _expand_multirun, main


def test_expand_multirun_grid():
    jobs = _expand_multirun(["a=1,2", "b=x"])
    assert jobs == [["a=1", "b=x"], ["a=2", "b=x"]]


@pytest.mark.slow
def test_multirun_trials_layout(tmp_cwd):
    main(
        [
            "-cn",
            "ci",
            "-m",
            "seed=1,2",
            "trainer.epochs=1",
            "data.patches.num_patches=8",
            "data.images.synthetic_size=96",
            "model.feature_map_channels=16",
            "model.afgsa.self_attention.num_layers=1",
            "model.afgsa.self_attention.num_heads=2",
        ],
    )
    trials = tmp_cwd / "outputs" / "trials"
    run_dirs = sorted(trials.glob("run*"))
    assert run_dirs, list(trials.iterdir())
    job_dirs = sorted(d for d in run_dirs[0].iterdir() if d.is_dir())
    # both sweep jobs share the trial run dir, one subdir per override set
    seeds = {d.name.split(",")[0] for d in job_dirs}
    assert {"seed=1", "seed=2"} <= seeds
    for d in job_dirs:
        if d.name.startswith("seed="):
            assert (d / "train_loss.txt").exists(), d
