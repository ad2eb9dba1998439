"""Run-dirs resolver tests (reference model: tests/test_pht_run_dirs_resolver.py)."""

from pixel_heal_thyself_tpu.config.run_dirs import (
    RunDirsCache,
    pht_run_dirs_resolver,
    register_run_dirs_resolver,
    reset_run_dirs_cache,
)

register_run_dirs_resolver()


class TestSingleRun:
    def test_auto_increment(self, tmp_cwd):
        d0 = pht_run_dirs_resolver("outputs", "afgsa_p32", "none", "-1", "false")
        assert d0 == "outputs/runs/afgsa_p32/run000"
        assert (tmp_cwd / d0).is_dir()
        reset_run_dirs_cache()
        d1 = pht_run_dirs_resolver("outputs", "afgsa_p32", "none", "-1", "false")
        assert d1 == "outputs/runs/afgsa_p32/run001"

    def test_explicit_run_num(self, tmp_cwd):
        d = pht_run_dirs_resolver("outputs", "pat", "none", "7", "false")
        assert d == "outputs/runs/pat/run007"

    def test_invalid_run_num_falls_back(self, tmp_cwd):
        d = pht_run_dirs_resolver("outputs", "pat", "none", "bogus", "false")
        assert d == "outputs/runs/pat/run000"

    def test_cache_returns_same_dir(self, tmp_cwd):
        d0 = pht_run_dirs_resolver("outputs", "pat", "none", "-1", "false")
        d1 = pht_run_dirs_resolver("outputs", "pat", "none", "-1", "false")
        assert d0 == d1
        assert RunDirsCache().run_dir is not None


class TestMultirun:
    def test_trials_with_subdir(self, tmp_cwd):
        d = pht_run_dirs_resolver("outputs", "none", "job_a=1", "-1", "true")
        assert d == "outputs/trials/run000/job_a=1"
        assert (tmp_cwd / d).is_dir()
        # second job in the same sweep shares run000
        d2 = pht_run_dirs_resolver("outputs", "none", "job_a=2", "-1", "true")
        assert d2 == "outputs/trials/run000/job_a=2"

    def test_cache_reset(self, tmp_cwd):
        pht_run_dirs_resolver("outputs", "none", "j", "-1", "true")
        reset_run_dirs_cache()
        cache = RunDirsCache()
        assert cache.run_dir is None and cache.is_multirun is None
