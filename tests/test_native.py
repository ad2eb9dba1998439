"""Native C++ accelerator parity: RNG stream and importance sampling must
be byte-identical to the pure-Python paths."""

import time
from random import Random

import numpy as np
import pytest

from pixel_heal_thyself_tpu.native import (
    get_lib,
    mt_random_doubles,
    mt_randints,
    native_importance_sample,
)
from pixel_heal_thyself_tpu.data.preprocessing import (
    get_importance_map,
    importance_sampling,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no g++?)",
)


class TestRngParity:
    def test_random_doubles_match(self):
        py = Random(12345)
        cc = Random(12345)
        want = [py.random() for _ in range(1000)]
        got = mt_random_doubles(cc, 1000)
        np.testing.assert_array_equal(got, want)
        # stream position identical afterwards
        assert cc.random() == py.random()

    def test_randints_match(self):
        for a, b in [(0, 9), (0, 127), (5, 1000003), (0, 2**40)]:
            py = Random(77)
            cc = Random(77)
            want = [py.randint(a, b) for _ in range(500)]
            got = mt_randints(cc, a, b, 500)
            np.testing.assert_array_equal(got, want)
            assert cc.randint(a, b) == py.randint(a, b)

    def test_mid_stream_state(self):
        py = Random(9)
        cc = Random(9)
        for _ in range(100):
            py.random()
            cc.random()
        py.randint(0, 5)  # desync check — advance python only
        with pytest.raises(AssertionError):
            np.testing.assert_array_equal(
                mt_random_doubles(cc, 10), [py.random() for _ in range(10)],
            )


class TestImportanceSamplingParity:
    def _data(self, seed=0, h=128, w=160):
        rng = np.random.default_rng(seed)
        return {
            "noisy": rng.uniform(0, 2, (h, w, 3)).astype(np.float32),
            "normal": rng.uniform(-1, 1, (h, w, 3)).astype(np.float32),
        }

    @pytest.mark.parametrize("seed", [0, 990819])
    def test_native_matches_python_exactly(self, seed):
        data = self._data(seed)
        py_rng = Random(seed)
        cc_rng = Random(seed)
        want = importance_sampling(data, 32, 30, py_rng, use_native=False)
        imp = get_importance_map(
            [data["noisy"], data["normal"]], ["relative", "variance"], [1.0, 1.0], 32,
        )
        got = native_importance_sample(
            data["noisy"].shape[:2], 32, 30, cc_rng, imp,
        )
        np.testing.assert_array_equal(got, want)
        # both rngs must end at the same stream position
        assert py_rng.random() == cc_rng.random()

    def test_default_path_uses_native_and_matches(self):
        data = self._data(3)
        a = importance_sampling(data, 32, 25, Random(1), use_native=True)
        b = importance_sampling(data, 32, 25, Random(1), use_native=False)
        np.testing.assert_array_equal(a, b)

    def test_native_is_faster_at_scale(self):
        data = self._data(1, h=512, w=512)
        imp = get_importance_map(
            [data["noisy"], data["normal"]], ["relative", "variance"], [1.0, 1.0], 128,
        )
        t0 = time.perf_counter()
        native_importance_sample(data["noisy"].shape[:2], 128, 200, Random(0), imp)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        importance_sampling(data, 128, 200, Random(0), use_native=False)
        t_py = time.perf_counter() - t0
        assert t_native < t_py  # typically 10-100x
