"""VAE training with a normalizing-flow posterior (incl. the UMNN MMAF).

Framework equivalent of the reference driver `TrainVaeFlow.py` +
`models/vae_lib/optimization/training.py`: Adamax(5e-4, eps 1e-7), beta
warmup ``min(epoch/warmup, max_beta)`` (`training.py:21`), per-train-batch
dynamic binarization for Omniglot-style datasets (`training.py:28-29`),
early stopping with patience (`TrainVaeFlow.py:265-292`), NaN guard raising
on non-finite validation loss (`:291-292`), per-batch Lipschitz projection
for MMAF fused into the train step (`training.py:46-48`), reconstruction
grids each eval epoch + prior-sample grids (`training.py:100-130`,
`visual_evaluation.py:9-53`), final IWAE evaluation with the Monte-Carlo
particle axis sharded across the device mesh (`log_likelihood.py:8-60`).

MMAF quadrature-step semantics:
* training: ``-steps 0`` resamples nb_steps ~ 2*U{10,49} per batch
  (`flows.py:319-321`) through zero-padded nodes — one compilation serves
  every step count;
* validation/test/IWAE always run at nb_steps=100 (`training.py:91-94,
  169-170`), regardless of the training step count.

Usage:
    python examples/train_vae.py -flow MMAF -nb_epoch 3 -synthetic
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from umnn_tpu.data.images import load_vae_dataset
from umnn_tpu.models.vae import VAE_FAMILIES, calculate_loss, calculate_loss_array
from umnn_tpu.models.vae.losses import bits_per_dim
from umnn_tpu.models.vae.iwae import calculate_likelihood
from umnn_tpu.ops.quadrature import padded_cc_quadrature
from umnn_tpu.parallel.mesh import batch_sharded, data_mesh, replicated
from umnn_tpu.training.checkpoint import CheckpointManager
from umnn_tpu.training.loops import (
    batch_iter,
    make_optimizer,
    make_train_step,
    retry_transient,
)
from umnn_tpu.utils.logging import MetricsWriter, get_logger

EVAL_STEPS = 100  # MMAF eval quadrature steps (`training.py:91-94`)
MAX_STEPS = 100  # randomized mode draws 2*U{10,49} -> max 98; pad to 100


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-dataset", default="mnist", choices=["mnist", "freyfaces", "omniglot", "caltech"])
    p.add_argument("-flow", default="no_flow", choices=sorted(VAE_FAMILIES))
    p.add_argument("-nb_epoch", type=int, default=2000)
    p.add_argument("-z_size", type=int, default=64)
    p.add_argument("-num_flows", type=int, default=4)
    p.add_argument("-made_h_size", type=int, default=320)
    p.add_argument("-num_ortho_vecs", type=int, default=32)
    p.add_argument("-num_householder", type=int, default=8)
    p.add_argument("-hidden_embedding", type=int, nargs="+", default=[512, 512])
    p.add_argument("-hidden_derivative", type=int, nargs="+", default=[100, 50, 50, 50])
    p.add_argument("-embedding_size", type=int, default=30)
    p.add_argument("-steps", type=int, default=50)
    p.add_argument("-lr", type=float, default=5e-4)
    p.add_argument("-b_size", type=int, default=100)
    p.add_argument("-warmup", type=int, default=100)
    p.add_argument("-max_beta", type=float, default=1.0)
    p.add_argument("-early_stopping_epochs", type=int, default=35)
    p.add_argument("-Lipshitz", type=float, default=0.0)
    p.add_argument("-iwae_samples", type=int, default=5000)
    p.add_argument("-iwae_minibatch", type=int, default=500)
    p.add_argument("-iwae_test_points", type=int, default=0, help="0 = all")
    p.add_argument("-seed", type=int, default=0)
    p.add_argument("-folder", default="runs/vae")
    p.add_argument("-synthetic", action="store_true")
    p.add_argument(
        "-eval_only", action="store_true",
        help="skip training: load the best-valid checkpoint from -folder and "
             "run the final test ELBO + IWAE protocol (use to rerun IWAE at "
             "the reference S=5000/MB=500 on a committed run)",
    )
    p.add_argument(
        "-plot_every", type=int, default=1,
        help="reconstruction/prior-sample grid cadence in epochs (0 = off)",
    )
    p.add_argument(
        "-load_npz", default="",
        help="warm-start params from a compact float16 snapshot "
             "(scripts/snapshot_params.py); with -eval_only, evaluates the "
             "snapshot directly — cross-round reproduction of committed "
             "headline numbers (mirrors train_uci.py)",
    )
    args = p.parse_args()

    folder = Path(args.folder) / f"{args.dataset}_{args.flow}"
    folder.mkdir(parents=True, exist_ok=True)
    logger = get_logger("vae", folder / "train.log")
    metrics = MetricsWriter(folder / "metrics.jsonl")
    # eval-only re-runs must not clobber the original training config
    args_name = "args_eval.json" if args.eval_only else "args.json"
    (folder / args_name).write_text(json.dumps(vars(args)))

    data = load_vae_dataset(args.dataset, synthetic=True if args.synthetic else None)
    c, hh, ww = data.input_size
    logger.info(
        "dataset %s (%s): %s train=%d valid=%d test=%d",
        args.dataset, data.input_type, data.input_size,
        len(data.trn), len(data.val), len(data.tst),
    )

    kw = dict(z_size=args.z_size, input_size=data.input_size, input_type=data.input_type)
    fam = args.flow
    if fam == "planar":
        kw["num_flows"] = args.num_flows
    elif fam == "orthogonal":
        kw.update(num_flows=args.num_flows, num_ortho_vecs=args.num_ortho_vecs)
    elif fam == "householder":
        kw.update(num_flows=args.num_flows, num_householder=args.num_householder)
    elif fam == "triangular":
        kw["num_flows"] = args.num_flows
    elif fam == "iaf":
        kw.update(num_flows=args.num_flows, made_h_size=args.made_h_size)
    elif fam == "MMAF":
        kw.update(
            num_flows=args.num_flows,
            made_h_size=args.made_h_size,
            hidden_derivative=tuple(args.hidden_derivative),
            hidden_embedding=tuple(args.hidden_embedding),
            embedding_size=args.embedding_size,
            nb_steps=args.steps if args.steps > 0 else 50,
        )
    is_mmaf = fam == "MMAF"
    random_steps = is_mmaf and args.steps == 0  # `flows.py:319-321`
    model = VAE_FAMILIES[fam](**kw)
    params = model.init(jax.random.PRNGKey(args.seed))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    logger.info("model %s params: %d devices: %s", fam, n_params, jax.devices())

    optimizer = make_optimizer("adamax", lr=args.lr, grad_clip=None)
    opt_state = optimizer.init(params)
    mesh = data_mesh()
    rep, shd = replicated(mesh), batch_sharded(mesh)

    # quadrature arrays (MMAF only): train at the (possibly random) step
    # count, eval ALWAYS at 100 steps (`training.py:91-94,169-170`); both
    # padded to one shape so a single compilation serves them
    quad = {}
    if is_mmaf:
        eval_nodes, eval_weights = padded_cc_quadrature(EVAL_STEPS, MAX_STEPS)
        quad = dict(nodes=eval_nodes, weights=eval_weights)

    def apply_model(prm, x, rng, nodes=None, weights=None):
        if is_mmaf:
            return model.apply(prm, x, rng, nodes=nodes, weights=weights)
        return model.apply(prm, x, rng)

    def loss_fn(prm, batch, rng, beta, nodes, weights):
        x = batch.reshape(-1, c, hh, ww)
        x_mean, z_mu, z_var, ldj, z0, zk = apply_model(prm, x, rng, nodes, weights)
        loss, rec, kl, bpd = calculate_loss(
            x_mean, x, z_mu, z_var, z0, zk, ldj,
            data.input_type, data.input_size, beta,
        )
        return loss, (rec, kl, bpd)

    # per-batch Lipschitz projection fused into the compiled step
    # (`training.py:46-48` projects after every opt.step). The power-
    # iteration init key is derived from the step's (already per-batch
    # fresh) reparameterization rng, so every projection starts from an
    # independent vector like the reference's fresh torch.randn (advisor r2)
    post_update = None
    if is_mmaf and args.Lipshitz > 0:

        def post_update(prm, rng, beta, nodes, weights):
            lip_k = jax.random.fold_in(rng, 0x11B)
            return model.force_lipschitz(prm, lip_k, args.Lipshitz)

    train_step = make_train_step(
        loss_fn, optimizer, mesh,
        extra_shardings=("rep", "rep", "rep", "rep"), has_aux=True,
        post_update=post_update,
    )

    def eval_vec_fn(prm, batch, rng):
        # per-sample loss so eval can skip wrap-padded duplicate rows;
        # MMAF evaluates at 100 quadrature steps (`training.py:91-94`)
        x = batch.reshape(-1, c, hh, ww)
        x_mean, z_mu, z_var, ldj, z0, zk = apply_model(prm, x, rng, **quad)
        return calculate_loss_array(
            x_mean, x, z_mu, z_var, z0, zk, ldj,
            data.input_type, data.input_size,
        )

    eval_step = retry_transient(jax.jit(
        eval_vec_fn, in_shardings=(rep, shd, rep), out_shardings=rep
    ))

    def recon_fn(prm, batch, rng):
        x = batch.reshape(-1, c, hh, ww)
        x_mean, *_ = apply_model(prm, x, rng, **quad)
        return x_mean

    recon_step = retry_transient(
        jax.jit(recon_fn, in_shardings=(rep, shd, rep), out_shardings=rep)
    )
    sample_step = retry_transient(
        jax.jit(model.decode, in_shardings=(rep, rep), out_shardings=rep)
    )

    def to_pixels(x_mean):
        """Render a decoder mean as [N,H,W(,C)] images in [0,1]
        (`visual_evaluation.py:11-16`: multinomial -> argmax/255)."""
        x = np.asarray(x_mean)
        if data.input_type == "multinomial":
            x = x.reshape(-1, 256, c, hh, ww).argmax(axis=1) / 255.0
        x = x.reshape(-1, c, hh, ww)
        return x[:, 0] if c == 1 else np.moveaxis(x, 1, -1)

    ckpt = CheckpointManager(folder / "ckpt")
    rng_np = np.random.RandomState(args.seed + 1)
    key = jax.random.PRNGKey(args.seed + 2)
    best_valid, patience, best_params = float("inf"), 0, params

    if args.load_npz:
        # cross-round warm start / reproduction from a committed compact
        # snapshot (scripts/snapshot_params.py); optimizer starts fresh
        from umnn_tpu.training.checkpoint import load_params_npz

        params = load_params_npz(args.load_npz, params)
        best_params = params
        logger.info("warm-started params from %s (optimizer fresh)", args.load_npz)

    if args.eval_only:
        if args.load_npz:
            logger.info("eval-only: evaluating the npz snapshot directly")
        else:
            loaded = ckpt.load_best("valid", params)
            if loaded is None:
                logger.info(
                    "-eval_only: no best_valid checkpoint under %s", ckpt.directory
                )
                return 1
            best_params = loaded
            logger.info(
                "eval-only: loaded best-valid checkpoint from %s", ckpt.directory
            )

    for epoch in range(0 if args.eval_only else args.nb_epoch):
        t0 = time.time()
        beta = min(
            (epoch + 1) * 1.0 / max(args.warmup, 1), args.max_beta
        )  # beta-warmup (`training.py:21`)
        losses = []
        for b in batch_iter(data.trn, args.b_size, rng_np):
            if data.dynamic_binarization:
                # per-batch bernoulli(data) draw (`training.py:28-29`)
                b = rng_np.binomial(1, b).astype(np.float32)
            if random_steps:
                # nb_steps ~ 2*U{10,49} per batch (`flows.py:319-321`)
                n_steps = 2 * rng_np.randint(10, 50)
                nodes, weights = padded_cc_quadrature(n_steps, MAX_STEPS)
            elif is_mmaf:
                # static mode: no padding (zero-weight nodes still cost
                # integrand evaluations in both sweeps)
                nodes, weights = padded_cc_quadrature(args.steps, args.steps)
            else:
                nodes = weights = jnp.zeros(0)  # unused by non-MMAF models
            key, k = jax.random.split(key)
            params, opt_state, loss, (rec, kl, bpd) = train_step(
                params, opt_state, jnp.asarray(b), k, jnp.float32(beta),
                nodes, weights,
            )
            losses.append(loss)
        vloss, v_n = [], 0
        for b, nv in batch_iter(data.val, args.b_size, rng_np, shuffle=False, with_counts=True):
            key, k = jax.random.split(key)
            vloss.append(eval_step(params, jnp.asarray(b), k)[:nv].sum())
            v_n += nv
        train_loss = float(jnp.stack(losses).mean())
        valid_loss = float(jnp.stack(vloss).sum()) / max(v_n, 1)
        if not np.isfinite(valid_loss):
            raise ValueError(f"NaN/inf validation loss at epoch {epoch}")
        metrics.scalar("train_loss", train_loss, epoch)
        metrics.scalar("valid_loss", valid_loss, epoch)
        if data.input_type == "multinomial":
            # per-epoch bits/dim for multinomial datasets (`training.py:157`)
            metrics.scalar(
                "valid_bpd", float(bits_per_dim(valid_loss, data.input_size)), epoch
            )
        logger.info(
            "epoch %3d  beta %.3f  train %.2f  valid %.2f%s  (%.1fs)",
            epoch, beta, train_loss, valid_loss,
            (
                f"  valid bpd {bits_per_dim(valid_loss, data.input_size):.4f}"
                if data.input_type == "multinomial" else ""
            ),
            time.time() - t0,
        )
        # reconstruction + prior-sample grids on the first valid batch
        # (`training.py:100-130`, `visual_evaluation.py:9-53`)
        if args.plot_every and epoch % args.plot_every == 0:
            try:
                from umnn_tpu.utils.visualize import image_grid

                rdir = folder / "reconstruction"
                rdir.mkdir(exist_ok=True)
                vb = data.val[: args.b_size]
                if len(vb) < args.b_size:  # static shapes for the jit
                    vb = np.concatenate([vb, vb[: args.b_size - len(vb)]])
                key, k1, k2 = jax.random.split(key, 3)
                if epoch == 0:
                    # raw data is already pixel-valued — must not route
                    # through to_pixels' multinomial 256-logit argmax branch
                    real = vb.reshape(-1, c, hh, ww)
                    real = real[:, 0] if c == 1 else np.moveaxis(real, 1, -1)
                    image_grid(real[:9], rdir / "real.png", ncols=3)
                xm = recon_step(params, jnp.asarray(vb), k1)
                image_grid(
                    to_pixels(xm)[:9],
                    rdir / f"{epoch}_elbo_{valid_loss:.4f}.png", ncols=3,
                )
                zs = jax.random.normal(k2, (9, args.z_size))
                image_grid(
                    to_pixels(sample_step(params, zs))[:9],
                    rdir / f"{epoch}_prior_samples.png", ncols=3,
                )
            except Exception as e:  # matplotlib optional
                logger.info("plots skipped: %s", e)
        if valid_loss < best_valid:
            # device-copy: the next epoch's train_step donates params buffers
            best_valid, patience = valid_loss, 0
            best_params = jax.tree_util.tree_map(jnp.copy, params)
            ckpt.save_best("valid", params)
        elif args.warmup < epoch:
            patience += 1
            if patience > args.early_stopping_epochs:
                logger.info("early stopping at epoch %d", epoch)
                break

    # final evaluation on the BEST params: test-set ELBO (for the
    # multinomial `bpd (elbo)` line, `training.py:157-163`) then the IWAE
    # log-likelihood with the particle axis sharded over the mesh
    tloss, t_n = [], 0
    for b, nv in batch_iter(data.tst, args.b_size, rng_np, shuffle=False, with_counts=True):
        key, k = jax.random.split(key)
        tloss.append(eval_step(best_params, jnp.asarray(b), k)[:nv].sum())
        t_n += nv
    test_elbo = float(jnp.stack(tloss).sum()) / max(t_n, 1)
    tst = data.tst
    if args.iwae_test_points:
        tst = tst[: args.iwae_test_points]
    tst = tst.reshape(-1, c, hh, ww)
    key, k = jax.random.split(key)
    n_s = args.iwae_samples if args.dataset != "caltech" else 2000
    ll_mean, _ = calculate_likelihood(
        model, best_params, tst, k, n_samples=n_s,
        minibatch=args.iwae_minibatch, mesh=mesh,
        apply_kwargs=quad or None,  # MMAF IWAE at 100 steps (`training.py:169-170`)
    )
    logger.info("FINAL test ELBO: %.4f  test IWAE ll: %.4f (S=%d)", test_elbo, ll_mean, n_s)
    out = {
        "dataset": args.dataset, "flow": fam,
        "best_valid_elbo": None if np.isinf(best_valid) else best_valid,
        "test_elbo": test_elbo,
        "test_iwae_ll": ll_mean, "iwae_samples": n_s,
    }
    if data.input_type == "multinomial":
        # reference reporting for multinomial datasets (`training.py:160-167`):
        # bpd of the test ELBO and bpd of the IWAE NLL (`log_likelihood.py:53-54`)
        bpd_elbo = float(bits_per_dim(test_elbo, data.input_size))
        bpd_ll = float(bits_per_dim(-ll_mean, data.input_size))
        logger.info("====> Test set bpd (elbo): %.4f", bpd_elbo)
        logger.info("====> Test set bpd (log-likelihood): %.4f", bpd_ll)
        out.update(test_bpd_elbo=bpd_elbo, test_bpd_ll=bpd_ll)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
