import time, os, jax, jax.numpy as jnp, numpy as np
from pixel_heal_thyself_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
from pixel_heal_thyself_tpu.config import LossesConfig
from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
from pixel_heal_thyself_tpu.training.train_step import init_train_state, make_optimizer, make_train_step

PATCH, BATCH, ITERS = 128, 8, 20
CH = int(os.environ.get("FAST_CH", "128"))
NSA = int(os.environ.get("FAST_NSA", "5"))
g_model = AFGSANet(dtype=jnp.bfloat16, use_pallas=True, num_gcp=0,
                   base_ch=CH, enc_ch=CH, num_sa=NSA)
d_model = DiscriminatorVGG(input_size=PATCH, dtype=jnp.bfloat16)
g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
noisy0 = jnp.zeros((BATCH, PATCH, PATCH, 3)); aux0 = jnp.zeros((BATCH, PATCH, PATCH, 7))
gstate = init_train_state(g_model, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy0)
step_fn = make_train_step(g_model, d_model, LossesConfig(), False, g_tx, d_tx)
rng_np = np.random.default_rng(0)
batch = {
  "noisy": jnp.asarray(np.abs(rng_np.standard_normal((BATCH, PATCH, PATCH, 3))).astype(np.float32)),
  "gt": jnp.asarray(np.abs(rng_np.standard_normal((BATCH, PATCH, PATCH, 3))).astype(np.float32)),
  "aux": jnp.asarray(rng_np.standard_normal((BATCH, PATCH, PATCH, 7)).astype(np.float32)),
}
rng = jax.random.PRNGKey(7)
for _ in range(3):
    gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
float(metrics["g_loss"])
start = time.perf_counter()
for _ in range(ITERS):
    gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
gl = float(metrics["g_loss"])
el = time.perf_counter() - start
import flax
nparams = sum(x.size for x in jax.tree.leaves(gstate.params))
print(f"ch={CH} nsa={NSA} G params={nparams:,}  {BATCH*ITERS/el:.2f} p/s  ({el*1e3/ITERS:.1f} ms/step)")
