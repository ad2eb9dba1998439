"""The training runtime: dataset build-if-missing, GAN loop, validation.

Behavioral spec: reference `pht/models/base_trainer.py:83-595` and the
per-model trainers (`pht/models/afgsa/train.py:11-37`,
`pht/models/mamba/train.py:13-45`):

- determinism setup seeded from cfg.seed; padding_mode = replicate when
  deterministic else reflect (`base_trainer.py:334`);
- patch stores built on first run (`:245-262`);
- alternating WGAN-GP (or RaHinge-multiscale) training with Adam(1e-4) and
  MultiStepLR-parity decay;
- per-epoch `train_loss.txt` lines `Epoch: N \tG loss: x \tD Loss: y`;
- per-`save_interval` validation with PSNR/SSIM/MRSE into `evaluation.txt`
  lines `Validation: N \tAvg MRSE: a \tAvg PSNR: b \tAvg 1-SSIM: c`
  (field strings preserved — `tools/runs_analysis.py` regex-parses them);
- validation PNG panels every `save_img_interval`;
- checkpoints under `model_epoch{N}` — here full Orbax state with a
  *working* resume (the reference's `load_model` path was broken,
  SURVEY.md §5).

TPU-first: the train step is one compiled XLA program (train_step.py);
host work is only the prefetch feed and the metric epilogue.
"""

from __future__ import annotations

import math
import os
import random
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.config import Config
from pixel_heal_thyself_tpu.data.dataset import PatchDataset, PrefetchLoader
from pixel_heal_thyself_tpu.data.hdf5 import Hdf5Constructor
from pixel_heal_thyself_tpu.data.preprocessing import postprocess_specular
from pixel_heal_thyself_tpu.logger import logger
from pixel_heal_thyself_tpu.metrics import (
    calculate_psnr,
    calculate_rmse,
    calculate_ssim,
)
from pixel_heal_thyself_tpu.models.afgsa import AFGSANet, count_params, describe_params
from pixel_heal_thyself_tpu.models.discriminators import (
    DiscriminatorVGG,
    MultiScaleDiscriminator,
)
from pixel_heal_thyself_tpu.training import checkpoints
from pixel_heal_thyself_tpu.training.train_step import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    multistep_milestone_epochs,
)
from pixel_heal_thyself_tpu.utils.images import (
    create_folder,
    save_img_group,
    tensor2img,
)


_last_determinism_seed: list[int | None] = [None]


def set_determinism(seed: int) -> None:
    """Seed host RNGs (reference `base_trainer.py:50-67`). Device-side
    determinism comes from explicit jax.random keys.

    The reference guards this run-once because Hydra spawns one process
    per job; this multirun is in-process, so a pure run-once would leave
    jobs 2..n of a `-m seed=1,2,3` sweep seeded from job 1 — instead,
    re-apply whenever the requested seed changes."""
    if _last_determinism_seed[0] == seed:
        return
    _last_determinism_seed[0] = seed
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


class BaseTrainer:
    """Model-agnostic GAN trainer; subclasses provide the generator."""

    def __init__(self, cfg: Config) -> None:
        self.cfg = cfg
        self.deterministic = cfg.trainer.deterministic
        self.model_name = self.__class__.__name__.replace("Trainer", "")
        set_determinism(cfg.seed)
        # multi-host: join the jax.distributed runtime BEFORE any device
        # use; every host then sees the global device set (parallel/
        # distributed.py — env-driven or parallel.multihost on TPU pods)
        from pixel_heal_thyself_tpu.parallel.distributed import (
            is_main_process,
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed(cfg.parallel.multihost)
        self.is_main = is_main_process()
        self.padding_mode = "replicate" if self.deterministic else "reflect"
        if cfg.trainer.precision not in ("bf16", "fp32"):
            raise ValueError(
                f"trainer.precision must be 'bf16' or 'fp32', "
                f"got {cfg.trainer.precision!r}",
            )
        self.compute_dtype = (
            jnp.bfloat16 if cfg.trainer.precision == "bf16" else jnp.float32
        )
        # keep fp32 matmuls genuinely fp32 on the MXU; set BOTH ways so an
        # in-process multirun sweep over precision doesn't leak the fp32
        # job's global setting into the bf16 jobs that follow
        jax.config.update(
            "jax_default_matmul_precision",
            "highest" if cfg.trainer.precision == "fp32" else None,
        )
        # fused Pallas attention on real TPUs; XLA path elsewhere (CPU tests)
        self.use_pallas = cfg.trainer.use_pallas and jax.default_backend() not in (
            "cpu",
            "gpu",  # the fused kernels are Pallas-TPU (Mosaic) only
        )
        self.mesh = self._build_mesh()

    def _build_mesh(self):
        """('data','model') mesh from cfg.parallel — DP batch sharding is
        the primary scaling axis (SURVEY.md §2.10); data_axis=-1 auto-sizes
        to the devices and global batch. A 1×1 mesh degenerates to the
        single-chip program."""
        from pixel_heal_thyself_tpu.parallel.mesh import auto_data_axis, make_mesh

        par = self.cfg.parallel
        n = jax.device_count()
        data_axis = par.data_axis
        if data_axis == -1:
            data_axis = auto_data_axis(n, par.model_axis, self.cfg.trainer.batch_size)
        mesh = make_mesh(data_axis=data_axis, model_axis=par.model_axis)
        if self.cfg.trainer.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"trainer.batch_size={self.cfg.trainer.batch_size} must be "
                f"divisible by the data-parallel degree {mesh.shape['data']}",
            )
        if jax.process_count() > 1 and mesh.size != n:
            # a partial mesh would leave some hosts without addressable
            # shards while host_batch_bounds still hands them batch rows
            raise ValueError(
                f"multi-host run: mesh {mesh.shape['data']}x"
                f"{mesh.shape['model']} covers {mesh.size} of {n} global "
                "devices; raise trainer.batch_size or set "
                "parallel.data_axis/model_axis so data*model == device count",
            )
        if mesh.size > 1:
            logger.info(
                f"Mesh: {mesh.shape['data']} data x {mesh.shape['model']} "
                f"model over {n} visible devices",
            )
        return mesh

    # -- factories -------------------------------------------------------
    def create_generator(self):
        raise NotImplementedError

    def create_discriminator(self):
        if self.cfg.model.discriminator.use_multiscale_discriminator:
            return MultiScaleDiscriminator(
                in_nc=self.cfg.model.input_channels,
                patch_size=self.cfg.data.patches.patch_size,
                dtype=self.compute_dtype,
            )
        return DiscriminatorVGG(
            in_nc=3,
            base_nf=64,
            input_size=self.cfg.data.patches.patch_size,
            dtype=self.compute_dtype,
        )

    # -- data ------------------------------------------------------------
    def setup_dataloaders(self):
        patches_dir = self.cfg.data.patches.dir
        train_path = os.path.join(patches_dir, "train.h5")
        val_path = os.path.join(patches_dir, "val.h5")
        need_build = not (os.path.exists(train_path) and os.path.exists(val_path))
        if need_build:
            # multi-host: only process 0 builds into the (shared) data dir —
            # concurrent writers would corrupt the stores; everyone else
            # waits at the barrier and then reads the finished files
            if self.is_main:
                if self.cfg.data.images.synthesize and not os.path.isdir(
                    self.cfg.data.images.dir,
                ):
                    from pixel_heal_thyself_tpu.data.synthetic import (
                        generate_dataset,
                    )

                    logger.info(
                        f"Images dir {self.cfg.data.images.dir} missing — "
                        "generating synthetic scenes",
                    )
                    generate_dataset(
                        self.cfg.data.images.dir,
                        height=self.cfg.data.images.synthetic_size,
                        width=self.cfg.data.images.synthetic_size,
                        noise_scale=self.cfg.data.images.synthetic_noise,
                        seed=self.cfg.seed,
                    )
                logger.info(f"Creating dataset: patches in {patches_dir}")
                os.makedirs(patches_dir, exist_ok=True)
                Hdf5Constructor(
                    self.cfg.data.images.dir,
                    patches_dir,
                    self.cfg.data.patches.patch_size,
                    self.cfg.data.patches.num_patches,
                    self.cfg.seed,
                    self.cfg.data_ratio,
                    scale=self.cfg.data.images.scale,
                    deterministic=self.deterministic,
                ).construct_hdf5()
        if jax.process_count() > 1:
            # barrier runs UNCONDITIONALLY: gating it on need_build races —
            # a non-main process that first checks the store paths after
            # process 0 finished building would see them present, skip its
            # barrier call, and leave process 0 blocked in
            # sync_global_devices forever (or misaligned with the train
            # step's collectives)
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("pht_dataset_build")

        from pixel_heal_thyself_tpu.parallel.mesh import batch_sharding, replicated

        train_ds = PatchDataset(train_path)
        val_ds = PatchDataset(val_path)
        dp = self.mesh.shape["data"]
        host_bounds = None
        if jax.process_count() > 1:
            from pixel_heal_thyself_tpu.parallel.distributed import (
                host_batch_bounds,
            )

            host_bounds = host_batch_bounds(self.cfg.trainer.batch_size)
        loader_kind = self.cfg.data.loader
        if loader_kind == "auto":
            fits = (
                train_ds.nbytes + val_ds.nbytes
                <= self.cfg.data.device_cache_limit_gb * 1e9
            )
            loader_kind = (
                "device" if fits and jax.process_count() == 1 else "native"
            )
            logger.info(f"data.loader=auto resolved to {loader_kind!r}")
        if loader_kind == "device":
            from pixel_heal_thyself_tpu.data.dataset import DeviceLoader

            train_loader = DeviceLoader(
                train_ds,
                batch_size=self.cfg.trainer.batch_size,
                shuffle=True,
                seed=self.cfg.seed if self.deterministic else None,
                drop_last=dp > 1,
                device=batch_sharding(self.mesh),
            )
            val_loader = DeviceLoader(
                val_ds,
                batch_size=max(1, self.cfg.trainer.val_batch_size),
                shuffle=False,
                device=replicated(self.mesh),
            )
            return train_loader, val_loader, len(train_ds), len(val_ds)
        if loader_kind == "grain":
            from pixel_heal_thyself_tpu.data.grain_loader import GrainLoader

            train_loader = GrainLoader(
                train_ds,
                batch_size=self.cfg.trainer.batch_size,
                shuffle=True,
                seed=self.cfg.seed if self.deterministic else None,
                workers=self.cfg.trainer.num_workers,
                drop_last=dp > 1,
                device=batch_sharding(self.mesh),
            )
            val_loader = GrainLoader(
                val_ds,
                batch_size=max(1, self.cfg.trainer.val_batch_size),
                shuffle=False,
                device=replicated(self.mesh),
            )
            return train_loader, val_loader, len(train_ds), len(val_ds)
        if loader_kind != "native":
            raise ValueError(
                f"Unknown data.loader: {self.cfg.data.loader!r} "
                "(expected 'auto', 'device', 'native' or 'grain')",
            )
        train_loader = PrefetchLoader(
            train_ds,
            batch_size=self.cfg.trainer.batch_size,
            shuffle=True,
            seed=self.cfg.seed if self.deterministic else None,
            prefetch=self.cfg.trainer.prefetch_batches,
            workers=self.cfg.trainer.num_workers,
            # a ragged final batch can't shard over 'data' (and would
            # retrigger compilation); single-device keeps reference parity
            drop_last=dp > 1,
            device=batch_sharding(self.mesh),
            host_bounds=host_bounds,
        )
        val_loader = PrefetchLoader(
            val_ds,
            batch_size=max(1, self.cfg.trainer.val_batch_size),
            shuffle=False,
            prefetch=2,
            device=replicated(self.mesh),
        )
        return train_loader, val_loader, len(train_ds), len(val_ds)

    def print_training_config(self) -> None:
        cfg = self.cfg
        logger.info(f"Creating {self.model_name}")
        logger.info(f"{self.model_name} padding mode: {self.padding_mode}")
        logger.info(f"{self.model_name} curve order: {cfg.model.curve_order}")
        logger.info(f"{self.model_name} L1 lossW: {cfg.model.losses.l1_loss_w}")
        logger.info(f"{self.model_name} GAN lossW: {cfg.model.losses.gan_loss_w}")
        logger.info(f"{self.model_name} GP lossW: {cfg.model.losses.gp_loss_w}")
        logger.info(f"{self.model_name} precision: {cfg.trainer.precision}")
        if cfg.model.losses.use_ssim_loss:
            logger.info(f"{self.model_name} SSIM lossW: {cfg.model.losses.ssim_loss_w}")
        if cfg.model.discriminator.use_multiscale_discriminator:
            logger.info(f"{self.model_name} multiscale discriminator")
        if cfg.model.use_film:
            logger.info(f"{self.model_name} use FiLM")

    # -- training --------------------------------------------------------
    def train(self) -> None:
        cfg = self.cfg
        logger.info(
            f"Starting training: model={self.model_name}, seed={cfg.seed}, "
            f"batch_size={cfg.trainer.batch_size}, epochs={cfg.trainer.epochs}",
        )
        logger.info(f"Loading dataset: patches from {cfg.data.patches.dir}")
        train_loader, val_loader, n_train, n_val = self.setup_dataloaders()

        self.print_training_config()
        g_model = self.create_generator()
        d_model = self.create_discriminator()

        batch_size = cfg.trainer.batch_size
        # mirror the loader: DP drops the ragged final batch (drop_last),
        # so the LR schedule's steps_per_epoch must floor, not ceil —
        # otherwise milestone boundaries drift one step later per epoch
        # and the end-of-epoch logging branch never fires
        if self.mesh.shape["data"] > 1:
            total_iterations = n_train // batch_size
        else:
            total_iterations = math.ceil(n_train / batch_size)
        milestones = multistep_milestone_epochs(
            cfg.trainer.epochs, cfg.trainer.lr_milestone,
        )
        g_tx = make_optimizer(
            cfg.trainer.lr_g, milestones, cfg.trainer.lr_gamma, total_iterations,
            betas=tuple(cfg.trainer.optim.betas), eps=cfg.trainer.optim.eps,
        )
        d_tx = make_optimizer(
            cfg.trainer.lr_d, milestones, cfg.trainer.lr_gamma, total_iterations,
            betas=tuple(cfg.trainer.optim.betas), eps=cfg.trainer.optim.eps,
        )

        patch = cfg.data.patches.patch_size
        rng = jax.random.PRNGKey(cfg.seed)
        g_rng, d_rng, step_rng = jax.random.split(rng, 3)
        # init with the per-DP-shard batch: param shapes are batch-
        # independent, and a full GLOBAL batch forward on one device would
        # OOM at pod-scale batch sizes the sharded step itself handles fine
        init_b = max(1, batch_size // self.mesh.shape["data"])
        sample_noisy = jnp.zeros((init_b, patch, patch, 3))
        sample_aux = jnp.zeros((init_b, patch, patch, 7))
        gstate = init_train_state(g_model, g_tx, g_rng, sample_noisy, sample_aux)
        dstate = init_train_state(d_model, d_tx, d_rng, sample_noisy)

        start_epoch = 0
        if cfg.trainer.load_model and cfg.trainer.model_path:
            gstate, dstate, start_epoch = checkpoints.restore_checkpoint(
                cfg.trainer.model_path, gstate, dstate,
            )
            start_epoch += 1
            logger.info(
                f"Resumed from {cfg.trainer.model_path} at epoch {start_epoch}",
            )

        # place states on the mesh: G params TP-shard over 'model' (no-op at
        # model_axis=1), D + optimizer moments follow, grads psum over 'data'
        # via XLA from the sharding annotations
        from pixel_heal_thyself_tpu.parallel.mesh import place_state, replicated

        gstate = place_state(gstate, self.mesh)
        dstate = place_state(dstate, self.mesh)
        step_rng = jax.device_put(step_rng, replicated(self.mesh))

        logger.debug(describe_params(gstate.params))
        logger.info(
            f"{self.model_name} G params: {count_params(gstate.params):,} | "
            f"D params: {count_params(dstate.params):,}",
        )

        lpips_params = None
        if cfg.model.losses.use_lpips_loss:
            from pixel_heal_thyself_tpu.models import lpips as lpips_mod

            path = cfg.model.losses.lpips_weights_path
            if path == "random":
                logger.warning("LPIPS using RANDOM weights (test mode)")
                lpips_params = lpips_mod.random_lpips_params()
            elif path:
                lpips_params = lpips_mod.load_lpips_params(path)
            else:
                raise ValueError(
                    "use_lpips_loss=true requires "
                    "model.losses.lpips_weights_path (see "
                    "tools/convert_lpips_weights.py) or the value 'random'",
                )

        step_fn = make_train_step(
            g_model,
            d_model,
            cfg.model.losses,
            cfg.model.discriminator.use_multiscale_discriminator,
            g_tx,
            d_tx,
            lpips_params=lpips_params,
        )
        eval_fn = make_eval_step(g_model)

        root_save_path = cfg.paths.output_dir
        os.makedirs(root_save_path, exist_ok=True)
        save_img_interval = max(1, n_val // max(1, cfg.trainer.num_saved_imgs))

        logger.info("Start training")
        for epoch in range(start_epoch, cfg.trainer.epochs):
            start = time.time()
            # metrics stay on device during the epoch — no per-iteration
            # host sync, so dispatch runs ahead of the chip
            epoch_metrics: list[dict] = []
            end = start
            i_batch = -1
            io_total = 0.0
            for i_batch, batch in enumerate(train_loader):
                end_io = time.time()
                io_took = end_io - end
                io_total += io_took
                # profiler trace of a steady-state window (reference had no
                # tracing at all, SURVEY.md §5; iter_time/io_time retained).
                # Short epochs clamp the window so the trace always closes.
                if (
                    cfg.trainer.profile_dir
                    and epoch == start_epoch
                    and total_iterations >= 2
                ):
                    prof_start = min(10, max(0, total_iterations - 2))
                    prof_stop = min(15, total_iterations - 1)
                    if i_batch == prof_start:
                        jax.profiler.start_trace(cfg.trainer.profile_dir)
                    elif i_batch == prof_stop:
                        jax.profiler.stop_trace()
                        logger.info(
                            f"Wrote profiler trace to {cfg.trainer.profile_dir}",
                        )
                gstate, dstate, metrics = step_fn(gstate, dstate, batch, step_rng)
                epoch_metrics.append(metrics)
                if i_batch % 10 == 0 or i_batch == total_iterations - 1:
                    # sync point only on logging iterations
                    g_l = float(metrics["g_loss"])
                    d_l = float(metrics["d_loss"])
                    iter_took = time.time() - end
                    logger.debug(
                        f"[Train] epoch={epoch + 1} iter={i_batch + 1}/{total_iterations} "
                        f"g_loss={g_l / batch_size:.4f} d_loss={d_l / batch_size:.4f} "
                        f"iter_time={iter_took:.2f}s io_time={io_took:.2f}s",
                    )
                end = time.time()

            n_iters = i_batch + 1
            epoch_g = float(
                np.sum([np.asarray(m["g_loss"]) for m in epoch_metrics]),
            ) / batch_size / max(1, n_iters)
            epoch_d = float(
                np.sum([np.asarray(m["d_loss"]) for m in epoch_metrics]),
            ) / batch_size / max(1, n_iters)
            # io share = time the step loop spent blocked in the loader
            # (reference logs iter_time/io_time per 10 iters,
            # base_trainer.py:459-467 — its known CPU bottleneck; the
            # epoch aggregate makes SURVEY hard-part #5 measurable here)
            logger.info(
                f"[Train] epoch={epoch + 1} summary: g_loss={epoch_g:.4f} "
                f"d_loss={epoch_d:.4f} time={int(end - start)}s "
                f"({n_train / max(1e-9, end - start):.1f} patches/sec, "
                f"io {io_total:.1f}s = "
                f"{100 * io_total / max(1e-9, end - start):.0f}%)",
            )
            if self.is_main:
                with open(
                    os.path.join(root_save_path, "train_loss.txt"), "a",
                ) as f:
                    f.write(
                        f"Epoch: {epoch + 1} \tG loss: {epoch_g:.4f} "
                        f"\tD Loss: {epoch_d:.4f}\n",
                    )

            if epoch % cfg.trainer.save_interval == 0:
                self._validate_and_save(
                    epoch,
                    gstate,
                    dstate,
                    eval_fn,
                    val_loader,
                    n_val,
                    root_save_path,
                    save_img_interval,
                )

    # -- validation ------------------------------------------------------
    def _validate_and_save(
        self,
        epoch: int,
        gstate,
        dstate,
        eval_fn,
        val_loader,
        n_val: int,
        root_save_path: str,
        save_img_interval: int,
    ) -> None:
        # multi-host: every process runs the (replicated) eval forwards so
        # collectives stay in step, but only process 0 touches the shared
        # run directory — concurrent writers would corrupt the checkpoint
        # and interleave evaluation.txt
        if self.is_main:
            current_save_path = create_folder(
                os.path.join(root_save_path, f"model_epoch{epoch + 1}"),
            )
            checkpoints.save_checkpoint(
                Path(current_save_path) / "state", gstate, dstate, epoch,
            )

        avg_psnr = avg_ssim = avg_mrse = 0.0
        start = time.time()
        # val runs batched (trainer.val_batch_size); the metric functions
        # batch-SUM 4-d inputs (reference quirk, metrics.py), and image
        # panels are keyed by global sample index, so any batch size yields
        # the reference's batch-1 values and artifact set exactly
        sample_base = 0
        for batch in val_loader:
            output, noisy, gt = eval_fn(gstate.params, batch)
            output_lin = postprocess_specular(np.asarray(output, np.float64))
            gt_lin = np.asarray(gt, np.float64)
            noisy_255 = tensor2img(np.asarray(noisy), post_spec=True)
            output_255 = tensor2img(np.asarray(output), post_spec=True)
            gt_255 = tensor2img(gt_lin)

            if self.is_main:
                for j in range(output_255.shape[0]):
                    idx = sample_base + j
                    if idx % save_img_interval == 0:
                        save_img_group(
                            current_save_path, idx,
                            noisy_255[j], output_255[j], gt_255[j],
                        )
            sample_base += output_255.shape[0]

            avg_mrse += calculate_rmse(output_lin, gt_lin)
            avg_psnr += calculate_psnr(output_255, gt_255)
            avg_ssim += calculate_ssim(output_255, gt_255)

        end = time.time()
        avg_mrse /= n_val
        avg_psnr /= n_val
        avg_ssim /= n_val
        logger.info(
            f"[Val] epoch={epoch + 1} summary: avg_mrse={avg_mrse:.4f} "
            f"avg_psnr={avg_psnr:.4f} avg_1-ssim={1 - avg_ssim:.4f} "
            f"time={int(end - start)}s",
        )
        if self.is_main:
            with open(os.path.join(root_save_path, "evaluation.txt"), "a") as f:
                f.write(
                    f"Validation: {epoch + 1} \tAvg MRSE: {avg_mrse:.4f} "
                    f"\tAvg PSNR: {avg_psnr:.4f} \tAvg 1-SSIM: {1 - avg_ssim:.4f}\n",
                )


class AFGSATrainer(BaseTrainer):
    """AFGSA generator factory (reference `pht/models/afgsa/train.py`)."""

    def create_generator(self) -> AFGSANet:
        m = self.cfg.model
        return AFGSANet(
            input_channels=m.input_channels,
            aux_input_channels=m.aux_input_channels,
            base_ch=m.feature_map_channels,
            num_sa=m.self_attention.num_layers,
            block_size=m.self_attention.block_size,
            halo_size=m.self_attention.halo_size,
            num_heads=m.self_attention.num_heads,
            num_gcp=m.num_gradient_checkpoints,
            padding_mode=self.padding_mode,
            curve_order=m.curve_order,
            use_film=m.use_film,
            use_pallas=self.use_pallas,
            fold_qkv=self.use_pallas and self.cfg.trainer.fold_qkv,
            # ops/block_mega.py whole-TransformerBlock megakernel:
            # measured 78.11 -> 89.87 patches/sec on the prod bench
            # (BASELINE.md round-5); gated per-shape/dtype inside
            # AFGSANet with automatic fallback to the literal path
            use_block_kernel=self.use_pallas,
            enc_ch=m.enc_channels,
            dtype=self.compute_dtype,
        )


class MambaTrainer(BaseTrainer):
    """Mamba generator factory (reference `pht/models/mamba/train.py`)."""

    def create_generator(self):
        from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet

        m = self.cfg.model
        return MambaDenoiserNet(
            input_channels=m.input_channels,
            aux_input_channels=m.aux_input_channels,
            base_ch=m.feature_map_channels,
            height=self.cfg.data.patches.patch_size,
            width=self.cfg.data.patches.patch_size,
            num_blocks=m.num_layers,
            d_state=m.d_state,
            d_conv=m.d_conv,
            expansion=m.expansion,
            headdim=m.headdim,
            num_gcp=m.num_gradient_checkpoints,
            padding_mode=self.padding_mode,
            enc_ch=m.enc_channels,
            dtype=self.compute_dtype,
            # NOT self.use_pallas: the fused conv1d+silu prologue kernel
            # measured net-slower than XLA's own fusion of that chain
            # (158.6 -> 167.0 ms G fwd+bwd; BASELINE.md round-3 negative
            # results) — the XLA path stays the production default
            use_pallas=False,
            # the ops/ssd_mega.py fused-interior megakernel: measured
            # 25.2 -> 10.4 ms per layer fwd+bwd at prod shapes on v5e
            # (BASELINE.md round-5); gated per-shape inside the layer and
            # off for CPU/GPU backends automatically
            use_megakernel=self.use_pallas,
        )
