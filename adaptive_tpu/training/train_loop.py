"""The training pipeline stage: epochs, logging, eval, early stop, checkpoints.

Reference parity: main_train (code_src/train.py:16-181) — seeded run, bucket
loader, dual optimizers + ReduceLROnPlateau x2 (stepped at epoch start on the
previous epoch's mean loss, initial 100), CNN fine-tune gating from epoch
opt_fine_tune_cnn_start_epoch+1, loss/perplexity prints every train_log_step,
weight/grad histogram + scalar metrics, per-epoch CIDEr eval on train_eval +
val splits, early stop (patience 6), per-epoch checkpoint named
'cider-%.4f_model-%d' (train.py:176-178).

TPU-native: one jitted SPMD train step (training/step.py) over an optional
device mesh; batches are device_put with batch-dim sharding (parallel/mesh.py)
— no DataParallel-style replicate/scatter/gather code.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from adaptive_tpu.data.loader import CocoCaptionDataset, TrainBatches
from adaptive_tpu.data.vocab import Vocabulary
from adaptive_tpu.models.factory import get_model
from adaptive_tpu.parallel import make_mesh, shard_batch, shard_params
from adaptive_tpu.training import checkpoint as ckpt
from adaptive_tpu.training.optim import get_lr, make_dual_optimizer, set_lr
from adaptive_tpu.training.schedule import ReduceLROnPlateau, early_stop_Ornot
from adaptive_tpu.training.step import make_train_step
from adaptive_tpu.utils.logging import MetricWriter


def main_train(cf, mesh=None, dataset: Optional[CocoCaptionDataset] = None):
    """Returns (params, state, best_cider, best_epoch)."""
    rng = jax.random.PRNGKey(cf.train_random_seed)  # train.py:18-20

    # With auto-resume, checkpoints must land where the next restart scans —
    # a stable dir across runs, not this run's timestamped exp_dir.
    trained_model_path = cf.train_auto_resume_dir or os.path.join(
        cf.exp_dir or ".", "trained_models"
    )
    os.makedirs(trained_model_path, exist_ok=True)

    vocab = Vocabulary.load(cf.vocab_path)
    cf = cf.replace(vocab_length=len(vocab))

    if cf.train_auto_resume_dir:
        # Preemptible-run recovery: resume from the newest complete checkpoint
        # in the given dir (full state via the blocks below), or start fresh
        # if there is none — one config for first start and every restart.
        # A checkpoint here always outranks train_pretrained_model: that is
        # the cold-start base (e.g. a released fine-tune source); the resume
        # dir holds THIS job's own later progress.
        latest = ckpt.find_latest_checkpoint(cf.train_auto_resume_dir)
        if latest:
            print("auto-resume: found checkpoint", latest)
            cf = cf.replace(train_pretrained=True, train_pretrained_model=latest)
        elif cf.train_pretrained and cf.train_pretrained_model:
            print("auto-resume: no checkpoint yet - starting from",
                  cf.train_pretrained_model)
        else:
            print("auto-resume: no checkpoint in", cf.train_auto_resume_dir, "- fresh start")

    if dataset is None:
        dataset = CocoCaptionDataset(cf.resized_image_dir, cf.train_anno_path, vocab)
    loader = TrainBatches(
        dataset,
        cf.train_batch_size,
        seed=cf.train_random_seed,
        num_workers=cf.dataloader_num_workers,
        # multi-host: every process computes the same batch plan from the
        # seed but decodes only its slice (each image read once cluster-wide)
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    writer = MetricWriter(os.path.join(cf.exp_dir or ".", "tensorboard"))

    rng, init_key = jax.random.split(rng)
    model, params, state, start_epoch = get_model(cf, init_key)
    dual, opt_state = make_dual_optimizer(params, cf)
    ckpt_saver = ckpt.AsyncCheckpointer()

    if mesh is None and len(jax.devices()) > 1:
        candidate = make_mesh(cf)
        if cf.train_batch_size % candidate.shape[cf.mesh_axes[0]] == 0:
            mesh = candidate
        else:
            if jax.process_count() > 1:
                raise ValueError(
                    "multi-process training requires a mesh: set "
                    "train_batch_size (%d) to a multiple of the data axis %d"
                    % (cf.train_batch_size, candidate.shape[cf.mesh_axes[0]])
                )
            print(
                "mesh disabled: batch %d not divisible by data axis %d"
                % (cf.train_batch_size, candidate.shape[cf.mesh_axes[0]])
            )
    if mesh is not None:
        params = shard_params(params, mesh)
        if cf.opt_state_sharding == "data":
            from adaptive_tpu.parallel import shard_opt_state

            opt_state = shard_opt_state(opt_state, mesh)  # ZeRO-1 moments

    decoder_sched = ReduceLROnPlateau(
        get_lr(opt_state, "decoder"), cf.opt_lrdecay_factor, cf.opt_lrdecay_patience,
        threshold=0.02, min_lr=1e-6,
    )  # train.py:57-58
    encoder_sched = ReduceLROnPlateau(
        get_lr(opt_state, "encoder"), cf.opt_lrdecay_factor, cf.opt_lrdecay_patience,
        threshold=0.02, min_lr=1e-7,
    )  # train.py:59-60

    train_epoch_loss = 100.0  # initial value for the scheduler (train.py:80)

    # Mid-epoch resume state (train_checkpoint_every_steps checkpoints carry
    # it; zero/empty for fresh starts and epoch-complete resumes).
    start_step = 0
    resumed_loss_sum: Optional[float] = None
    resumed_n_steps = 0
    global_n_iter = 0
    cider_scores, cider_scores_train_eval = [], []
    best_cider, best_epoch = 0.0, 0
    train_epoch_losses = []

    # Full resume: optimizer moments + LR-scheduler progress + rng stream +
    # metric histories from the checkpoint (the reference resumes weights
    # only — a deficiency its author flagged, for_wzn:15-17).
    if cf.train_pretrained and cf.train_pretrained_model:
        ckpt_dir = cf.train_pretrained_model
        if os.path.exists(os.path.join(ckpt_dir, "opt.npz")):
            opt_state = ckpt.restore_opt_state(ckpt_dir, opt_state)
            if mesh is not None and cf.opt_state_sharding == "data":
                # restore returns host arrays; re-place the ZeRO-1 shardings
                # or the resumed run replicates the moments it was sized for
                from adaptive_tpu.parallel import shard_opt_state

                opt_state = shard_opt_state(opt_state, mesh)
            print("resumed optimizer state from", ckpt_dir)
        meta = {}
        if os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
            meta = ckpt.load_metadata(ckpt_dir)
        for sched, key_ in ((decoder_sched, "decoder_sched"), (encoder_sched, "encoder_sched")):
            if key_ in meta:
                sched.lr = meta[key_]["lr"]
                sched.best = meta[key_]["best"]
                sched.num_bad_epochs = meta[key_]["num_bad_epochs"]
        train_epoch_loss = meta.get("train_epoch_loss", train_epoch_loss)
        if "rng_key" in meta:
            # the carried per-step rng stream: restoring it makes the resumed
            # run's augmentation/dropout draws bit-identical to uninterrupted
            rng = _rng_from_list(meta["rng_key"])
        global_n_iter = int(meta.get("global_n_iter", 0))
        train_epoch_losses = list(meta.get("train_epoch_losses", []))
        cider_scores = list(meta.get("cider_scores", []))
        cider_scores_train_eval = list(meta.get("cider_scores_train_eval", []))
        best_cider = float(meta.get("best_cider", 0.0))
        best_epoch = int(meta.get("best_epoch", 0))
        if meta.get("step_in_epoch"):
            # mid-epoch checkpoint: re-enter the SAME epoch at the saved step
            # (get_model parsed 'model-N' as epoch-complete -> N+1; override)
            start_epoch = int(meta["epoch"])
            start_step = int(meta["step_in_epoch"])
            resumed_loss_sum = float(meta["epoch_loss_sum"])
            resumed_n_steps = int(meta["epoch_n_steps"])
            print(
                "mid-epoch resume: epoch %d from step %d" % (start_epoch, start_step)
            )

    if dual.decoder_is_lbfgs or dual.encoder_is_lbfgs:
        from adaptive_tpu.training.lbfgs import make_lbfgs_train_step

        train_step = make_lbfgs_train_step(model, dual, cf)
    else:
        train_step = make_train_step(model, dual, cf)

    # one shared eval decoder: re-creating it per epoch would recompile the
    # encoder+decode XLA program twice per epoch
    eval_decoder = None
    if cf.train_evalOrnot:
        from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder

        eval_decoder = (
            make_beam_decoder(model, cf) if cf.beam_size > 1 else make_greedy_decoder(model, cf)
        )

    total_step = len(loader)
    encoder_opt_flag = False

    def resume_meta():
        """The non-weight resume payload (saved with every checkpoint): rng
        stream position, TB step counter, metric/early-stop histories,
        scheduler state. Reads the enclosing locals at call time."""
        return {
            "model": cf.atten_model_name,
            # true (unpadded) vocab size: the embed table's row count is the
            # PADDED vocab, so consumers peeking model.npz alone would count
            # the never-trained pad rows as words (bench.py::_checkpoint_vocab)
            "vocab_length": cf.vocab_length,
            "rng_key": _rng_to_list(rng),
            "global_n_iter": global_n_iter,
            "train_epoch_losses": train_epoch_losses,
            "cider_scores": cider_scores,
            "cider_scores_train_eval": cider_scores_train_eval,
            "best_cider": best_cider,
            "best_epoch": best_epoch,
            "decoder_sched": vars_of(decoder_sched),
            "encoder_sched": vars_of(encoder_sched),
        }

    final_params, final_state = params, state
    for epoch in range(start_epoch, cf.train_num_epochs + 1):
        print("#------------------Training for Epoch %d----------------#" % epoch)
        if epoch > cf.opt_fine_tune_cnn_start_epoch:  # train.py:89-90
            encoder_opt_flag = True
        # the batch plan is a pure function of seed+plan-index: pin it to the
        # epoch so a resumed run replays the same plan as the uninterrupted
        # one. epoch-1 keeps the historical stream (epochs number from 1,
        # train.py:85; plan indices from 0) — a fresh run realizes the exact
        # same shuffles as before this pin existed.
        loader.epoch = epoch - 1
        resuming_mid_epoch = epoch == start_epoch and start_step > 0

        if resuming_mid_epoch:
            # the scheduler already stepped at this epoch's original start and
            # its stepped state was checkpointed; stepping again would decay
            # twice. The restored opt_state carries the in-effect LRs.
            print("learning rate of Decoder is:", get_lr(opt_state, "decoder"))
            if encoder_opt_flag:
                print("learning rate of Encoder is:", get_lr(opt_state, "encoder"))
        else:
            # lr scheduling at epoch start on previous epoch's loss (train.py:93)
            new_dlr = decoder_sched.step(train_epoch_loss)
            opt_state = set_lr(opt_state, "decoder", new_dlr)
            print("learning rate of Decoder is:", new_dlr)
            writer.add_scalars("learning_rate_per_epoch", {"decoder": new_dlr}, epoch)
            if encoder_opt_flag:
                new_elr = encoder_sched.step(train_epoch_loss)
                opt_state = set_lr(opt_state, "encoder", new_elr)
                print("learning rate of Encoder is:", new_elr)
                writer.add_scalars("learning_rate_per_epoch", {"encoder": new_elr}, epoch)

        from adaptive_tpu.data.loader import device_prefetch
        from adaptive_tpu.parallel.mesh import data_sharding

        # on-device loss accumulator: one scalar fetch per epoch, not per step
        # (mid-epoch resume seeds it with the checkpointed partial sum — an
        # f32-exact float round-trip, so the epoch mean matches uninterrupted)
        loss_sum = resumed_loss_sum if resuming_mid_epoch else None
        n_steps = resumed_n_steps if resuming_mid_epoch else 0
        first_batch = start_step if resuming_mid_epoch else 0
        batches = device_prefetch(
            loader.iter_from(first_batch), size=2,
            sharding=data_sharding(mesh) if mesh is not None else None,
            local=loader.process_sharded,
        )
        every = cf.train_checkpoint_every_steps
        for i, batch in enumerate(batches, start=first_batch):
            rng, step_key = jax.random.split(rng)
            out = train_step(params, state, opt_state, batch, step_key, encoder_opt_flag)
            params, state, opt_state = out.params, out.model_state, out.opt_state
            loss_sum = out.loss if loss_sum is None else loss_sum + out.loss
            n_steps += 1

            if i % cf.train_log_step == 0:  # train.py:120-125
                loss = float(out.loss)  # sync only on log steps
                print(
                    "Epoch [%d/%d], Step [%d/%d], CrossEntropy Loss: %.4f, Perplexity: %5.4f"
                    % (epoch, cf.train_num_epochs, i, total_step, loss, np.exp(loss))
                )
            if global_n_iter % cf.train_tb_interval_batches == 0:  # train.py:128-138
                writer.add_param_histograms(params, global_n_iter)
                writer.add_scalar(
                    "loss-performance/train loss per batches", float(out.loss), global_n_iter
                )
                if cf.train_tb_lstm_clip_grad:
                    writer.add_scalar(
                        "decoder_norm/decoder_lstm_norm", float(out.lstm_grad_norm), global_n_iter
                    )
            global_n_iter += 1

            if every and (i + 1) % every == 0:  # mid-epoch resume point
                step_meta = resume_meta()
                step_meta.update({
                    "epoch": epoch,
                    "step_in_epoch": i + 1,
                    # f32-exact float round-trip: the resumed epoch mean
                    # equals the uninterrupted run's
                    "epoch_loss_sum": float(loss_sum),
                    "epoch_n_steps": n_steps,
                    "train_epoch_loss": train_epoch_loss,
                })
                ckpt_saver.save(
                    os.path.join(
                        trained_model_path, ckpt.step_checkpoint_name(epoch, i + 1)
                    ),
                    params, state, opt_state, metadata=step_meta,
                    # older '_step-K' dirs go only after this one is durable
                    prune_before=(epoch, i + 1),
                )

        if n_steps:
            train_epoch_loss = float(loss_sum) / n_steps
        writer.add_scalar("loss-performance/train loss per epoch", train_epoch_loss, epoch)
        print("Train Loss: epoch", epoch, train_epoch_loss)
        train_epoch_losses.append(train_epoch_loss)
        print("Train epoch losses:")
        print(train_epoch_losses)

        cider = 0.0
        if cf.train_evalOrnot:  # train.py:151-174
            from adaptive_tpu.evalcap.coco_eval import coco_eval

            cider_train_eval = coco_eval(
                cf, model, params, state, epoch=epoch, train_mode=True, vocab=vocab,
                decoder=eval_decoder,
            )
            cider_scores_train_eval.append(cider_train_eval)
            print("#---printing train_eval cider_scores---#")
            print(cider_scores_train_eval)

            cider = coco_eval(
                cf, model, params, state, epoch=epoch, vocab=vocab, decoder=eval_decoder
            )
            cider_scores.append(cider)
            print("#---printing validation cider_scores---#")
            print(cider_scores)

            writer.add_scalars(
                "loss-performance/Cider per epoch",
                {"train": cider_train_eval, "valid": cider},
                epoch,
            )
            if hasattr(eval_decoder, "prepare"):
                # release this epoch's prepared weight tree (it is stale the
                # moment training resumes; holding it would pin ~a full
                # compute-dtype encoder copy in HBM through the next epoch)
                eval_decoder.prepare.clear()
            if cider > best_cider:
                best_cider, best_epoch = cider, epoch
            if early_stop_Ornot(cf, cider_scores, best_cider):
                final_params, final_state = params, state
                break

        # per-epoch checkpoint (train.py:176-178), plus full resume payload;
        # async: the step only pays the device->host fetch, npz IO overlaps
        # the next epoch (checkpoint.AsyncCheckpointer)
        epoch_meta = resume_meta()
        epoch_meta.update({
            "epoch": epoch,
            "cider": cider,
            "train_epoch_loss": train_epoch_loss,
        })
        ckpt_saver.save(
            os.path.join(trained_model_path, ckpt.checkpoint_name(cider, epoch)),
            params,
            state,
            opt_state,
            metadata=epoch_meta,
            # this epoch's (and any earlier) mid-epoch checkpoints are now
            # subsumed; pruned only after the epoch checkpoint is durable
            prune_before=(epoch + 1, 0),
        )
        final_params, final_state = params, state

    ckpt_saver.wait()  # all checkpoints durable before the run reports done
    writer.close()
    print("Model of best epoch #: %d with CIDEr score %.2f" % (best_epoch, best_cider))
    figure_loss(cf, train_epoch_losses)
    return final_params, final_state, best_cider, best_epoch


def vars_of(sched: ReduceLROnPlateau) -> dict:
    return {"lr": sched.lr, "best": sched.best, "num_bad_epochs": sched.num_bad_epochs}


def _rng_to_list(rng) -> list:
    """PRNG key -> JSON-safe list of uint32 words (manifest.json payload)."""
    if jax.dtypes.issubdtype(getattr(rng, "dtype", None), jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)  # typed keys -> raw words
    return [int(x) for x in np.asarray(rng).ravel()]


def _rng_from_list(words) -> jax.Array:
    """Inverse of _rng_to_list. Returns a raw uint32 key vector — accepted by
    jax.random.split/fold_in regardless of whether the run that saved it used
    raw or typed keys (both serialize to the same words)."""
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(words, dtype=np.uint32))


def figure_loss(cf, train_losses):
    """Loss-curve figure (train.py:264-277 parity; saved once at run end)."""
    if not train_losses or not cf.exp_dir:
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    plt.figure()
    plt.title("Train Losses")
    plt.xlabel("epochs")
    plt.ylabel("losses")
    plt.plot(train_losses, color="b", label="train losses")
    plt.legend()
    plt.savefig(os.path.join(cf.exp_dir, "loss_figure_%d.jpg" % len(train_losses)))
    plt.close()
