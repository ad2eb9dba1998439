"""Independent torch Mamba2 oracle for `Mamba2Layer`.

The reference depends on `mamba_ssm.Mamba2` (CUDA/Triton, reference
`pht/models/mamba/model.py:6,53-58`). That package is unavailable here, so
this file re-implements the published Mamba2 block math (Dao & Gu 2024,
"Transformers are SSMs") in torch, following mamba_ssm's module layout —
in_proj -> split(z, xBC, dt) -> causal depthwise conv1d + SiLU ->
split(x, B, C) -> softplus(dt + dt_bias) -> scalar-per-head SSM scan with
A = -exp(A_log) and skip D -> gated RMSNorm (norm_before_gate=False) ->
out_proj — and checks our flax `Mamba2Layer` against it with copied
weights. Unlike `tests/test_mamba.py`'s chunked-vs-naive self-consistency,
this pins the *semantic layout* (split order, conv tap order, dt/A/D
plumbing, gating) to an implementation that shares no code with ours.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pixel_heal_thyself_tpu.models.mamba import Mamba2Layer


class TorchMamba2(torch.nn.Module):
    """Minimal Mamba2 block, mamba_ssm parameter conventions, fp64 scan."""

    def __init__(self, d_model, d_state, d_conv, expand, headdim, ngroups=1):
        super().__init__()
        self.d_inner = expand * d_model
        self.nheads = self.d_inner // headdim
        self.headdim = headdim
        self.ngroups = ngroups
        self.d_state = d_state
        conv_dim = self.d_inner + 2 * ngroups * d_state
        d_in_proj = 2 * self.d_inner + 2 * ngroups * d_state + self.nheads
        self.in_proj = torch.nn.Linear(d_model, d_in_proj, bias=False)
        self.conv1d = torch.nn.Conv1d(
            conv_dim, conv_dim, d_conv, groups=conv_dim, padding=d_conv - 1,
        )
        self.dt_bias = torch.nn.Parameter(torch.zeros(self.nheads))
        self.A_log = torch.nn.Parameter(torch.zeros(self.nheads))
        self.D = torch.nn.Parameter(torch.ones(self.nheads))
        self.norm_weight = torch.nn.Parameter(torch.ones(self.d_inner))
        self.out_proj = torch.nn.Linear(self.d_inner, d_model, bias=False)

    def forward(self, u):  # [b, l, d_model]
        b, l, _ = u.shape
        zxbcdt = self.in_proj(u)
        conv_dim = self.d_inner + 2 * self.ngroups * self.d_state
        z, xBC, dt = torch.split(
            zxbcdt, [self.d_inner, conv_dim, self.nheads], dim=-1,
        )
        xBC = torch.nn.functional.silu(
            self.conv1d(xBC.transpose(1, 2))[..., :l].transpose(1, 2),
        )
        x, B, C = torch.split(
            xBC,
            [self.d_inner, self.ngroups * self.d_state, self.ngroups * self.d_state],
            dim=-1,
        )
        dt = torch.nn.functional.softplus(dt + self.dt_bias)  # [b,l,h]
        A = -torch.exp(self.A_log)  # [h]

        xh = x.reshape(b, l, self.nheads, self.headdim)
        Bg = B.reshape(b, l, self.ngroups, self.d_state)
        Cg = C.reshape(b, l, self.ngroups, self.d_state)
        rep = self.nheads // self.ngroups
        Bh = Bg.repeat_interleave(rep, dim=2)  # [b,l,h,n]
        Ch = Cg.repeat_interleave(rep, dim=2)

        # sequential SSM recurrence (the definition, no chunking tricks)
        state = torch.zeros(
            b, self.nheads, self.d_state, self.headdim, dtype=u.dtype,
        )
        ys = []
        for t in range(l):
            decay = torch.exp(dt[:, t] * A)  # [b,h]
            inject = torch.einsum(
                "bhn,bhp->bhnp", Bh[:, t], xh[:, t] * dt[:, t, :, None],
            )
            state = decay[:, :, None, None] * state + inject
            ys.append(torch.einsum("bhn,bhnp->bhp", Ch[:, t], state))
        y = torch.stack(ys, dim=1) + self.D[None, None, :, None] * xh
        y = y.reshape(b, l, self.d_inner)

        # gated RMSNorm, norm_before_gate=False: rmsnorm(y * silu(z)) * w
        y = y * torch.nn.functional.silu(z)
        y = y * torch.rsqrt(y.pow(2).mean(-1, keepdim=True) + 1e-5)
        y = y * self.norm_weight
        return self.out_proj(y)


def test_mamba2_layer_matches_torch_oracle():
    d_model, d_state, d_conv, expand, headdim = 16, 8, 4, 2, 8
    b, l = 2, 24
    rng = np.random.default_rng(0)
    u = rng.standard_normal((b, l, d_model)).astype(np.float32)

    layer = Mamba2Layer(
        d_model=d_model, d_state=d_state, d_conv=d_conv,
        expand=expand, headdim=headdim, chunk_size=8,
    )
    variables = layer.init(jax.random.PRNGKey(3), jnp.asarray(u))
    got = np.asarray(layer.apply(variables, jnp.asarray(u)))

    p = variables["params"]
    oracle = TorchMamba2(d_model, d_state, d_conv, expand, headdim).double()
    with torch.no_grad():
        oracle.in_proj.weight.copy_(
            torch.from_numpy(np.asarray(p["in_proj"]["kernel"]).T).double(),
        )
        # flax weight is [k, conv_dim] tap-0-oldest; torch wants [c, 1, k]
        oracle.conv1d.weight.copy_(
            torch.from_numpy(np.asarray(p["conv1d_weight"]).T[:, None, :]).double(),
        )
        oracle.conv1d.bias.copy_(
            torch.from_numpy(np.asarray(p["conv1d_bias"])).double(),
        )
        oracle.dt_bias.copy_(torch.from_numpy(np.asarray(p["dt_bias"])).double())
        oracle.A_log.copy_(torch.from_numpy(np.asarray(p["A_log"])).double())
        oracle.D.copy_(torch.from_numpy(np.asarray(p["D"])).double())
        oracle.norm_weight.copy_(
            torch.from_numpy(np.asarray(p["norm"]["weight"])).double(),
        )
        oracle.out_proj.weight.copy_(
            torch.from_numpy(np.asarray(p["out_proj"]["kernel"]).T).double(),
        )
        want = oracle(torch.from_numpy(u).double()).numpy()

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_mamba2_layer_matches_oracle_multigroup():
    """Same check with ngroups > 1 exercising the grouped B/C broadcast."""
    d_model, d_state, d_conv, expand, headdim, ngroups = 16, 8, 4, 2, 8, 2
    b, l = 1, 17  # odd length: exercises chunk padding too
    rng = np.random.default_rng(1)
    u = rng.standard_normal((b, l, d_model)).astype(np.float32)

    layer = Mamba2Layer(
        d_model=d_model, d_state=d_state, d_conv=d_conv, expand=expand,
        headdim=headdim, ngroups=ngroups, chunk_size=8,
    )
    variables = layer.init(jax.random.PRNGKey(5), jnp.asarray(u))
    got = np.asarray(layer.apply(variables, jnp.asarray(u)))

    p = variables["params"]
    oracle = TorchMamba2(
        d_model, d_state, d_conv, expand, headdim, ngroups=ngroups,
    ).double()
    with torch.no_grad():
        oracle.in_proj.weight.copy_(
            torch.from_numpy(np.asarray(p["in_proj"]["kernel"]).T).double(),
        )
        oracle.conv1d.weight.copy_(
            torch.from_numpy(np.asarray(p["conv1d_weight"]).T[:, None, :]).double(),
        )
        oracle.conv1d.bias.copy_(
            torch.from_numpy(np.asarray(p["conv1d_bias"])).double(),
        )
        oracle.dt_bias.copy_(torch.from_numpy(np.asarray(p["dt_bias"])).double())
        oracle.A_log.copy_(torch.from_numpy(np.asarray(p["A_log"])).double())
        oracle.D.copy_(torch.from_numpy(np.asarray(p["D"])).double())
        oracle.norm_weight.copy_(
            torch.from_numpy(np.asarray(p["norm"]["weight"])).double(),
        )
        oracle.out_proj.weight.copy_(
            torch.from_numpy(np.asarray(p["out_proj"]["kernel"]).T).double(),
        )
        want = oracle(torch.from_numpy(u).double()).numpy()

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_dt_bias_init_is_inverse_softplus_of_loguniform():
    """softplus(dt_bias) must land in [dt_min, dt_max] (mamba_ssm init)."""
    layer = Mamba2Layer(d_model=16, d_state=8, expand=2, headdim=8)
    variables = layer.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))
    dt = jax.nn.softplus(variables["params"]["dt_bias"])
    assert np.all(np.asarray(dt) >= layer.dt_min - 1e-6)
    assert np.all(np.asarray(dt) <= layer.dt_max + 1e-6)
