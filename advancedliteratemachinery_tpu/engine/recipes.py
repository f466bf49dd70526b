"""Per-model training recipes: loss builders for the single pjit engine.

Each recipe returns a `loss_fn` compatible with engine.train.make_train_step
(pure params) or engine.train_extras.make_mutable_train_step (BatchNorm
models), plus the reference's optimizer settings. This replaces the six
engine styles in the reference (SURVEY.md §1 L3) with data: model → recipe.

Batches are dictionaries of fixed-shape arrays; all label preprocessing
(codecs, Levenshtein supervision) happens host-side in the data pipeline.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from advancedliteratemachinery_tpu.engine.train import (
    cross_entropy_ignore_pad,
    make_optimizer,
    mgp_str_loss,
)


def mgp_str_recipe(model) -> Tuple[Callable, Any]:
    """batch: images, char_ids, bpe_ids, wp_ids (train_final_dist.py:150)."""

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["images"],
                          deterministic=False, rngs={"dropout": rng})
        m = mgp_str_loss(out, batch)
        return m["loss"], m

    return loss_fn, make_optimizer(lr=1e-4, total_steps=2_000_000, grad_clip=5.0)


def lister_recipe(model, cfg) -> Tuple[Callable, Any]:
    """batch: images [B,32,W,3], mask [B,32,W], labels [B,L], label_lens [B]
    (train_dist.py: AdamW + cosine, grad clip 20)."""
    from advancedliteratemachinery_tpu.models.lister import lister_losses

    def loss_fn(params, batch, rng):
        res = model.apply({"params": params}, batch["images"], batch["mask"],
                          train=True, rngs={"dropout": rng})
        m = lister_losses(res, batch["labels"], batch["label_lens"], cfg)
        return m["loss"], m

    return loss_fn, make_optimizer(lr=8e-4, total_steps=600_000, grad_clip=20.0,
                                   weight_decay=0.01, warmup_steps=10_000)


def omniparser_recipe(model, padding_index: int) -> Tuple[Callable, Any]:
    """batch: images + input/target seqs per task (engine/train.py:26-41;
    AdamW, warmup + linear decay, rec weight 2 per train.sh)."""
    from advancedliteratemachinery_tpu.models.omniparser import omniparser_loss

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["images"],
                          {"pt": batch["pt_in"], "poly": batch["poly_in"],
                           "rec": batch["rec_in"]},
                          rngs={"dropout": rng})
        m = omniparser_loss(out, {"pt": batch["pt_out"],
                                  "poly": batch["poly_out"],
                                  "rec": batch["rec_out"]}, padding_index,
                            weights=(1.0, 1.0, 2.0))
        return m["loss"], m

    return loss_fn, make_optimizer(lr=5e-4, total_steps=400_000, grad_clip=0.1,
                                   weight_decay=1e-4, warmup_steps=5_000)


def lore_recipe(model) -> Tuple[Callable, Any]:
    """Mutable (BatchNorm) recipe. batch: images, hm [B,H,W,2], ct_inds,
    ct_mask, wh_target [B,K,8], logic_target [B,K,4]
    (src/lib/trains/ctdet.py:18 CtdetLoss weights hm 1 / wh 1 / ax ...)."""
    from advancedliteratemachinery_tpu.models.lore import (
        axis_loss,
        focal_loss,
        reg_l1_loss,
    )
    from advancedliteratemachinery_tpu.ops.heatmap import (
        gather_feat,
        sigmoid_clamped,
    )

    def loss_fn(params, batch_stats, batch, rng):
        (heads, logic), nv = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["ct_inds"], batch["ct_mask"],
            batch.get("gt_boxes"), method=model.train_logic,
            mutable=["batch_stats"], rngs={"dropout": rng})
        hm_loss = focal_loss(sigmoid_clamped(heads["hm"]), batch["hm"])
        wh_pred = gather_feat(heads["wh"], batch["ct_inds"])
        wh_loss = reg_l1_loss(wh_pred, batch["ct_mask"], batch["wh_target"])
        ax = axis_loss(logic["logic"], batch["ct_mask"], batch["logic_target"])
        if "stacked_logic" in logic:
            ax = ax + axis_loss(logic["stacked_logic"], batch["ct_mask"],
                                batch["logic_target"])
        loss = hm_loss + wh_loss + ax
        m = {"loss": loss, "hm_loss": hm_loss, "wh_loss": wh_loss,
             "axis_loss": ax}
        return loss, (m, nv["batch_stats"])

    return loss_fn, make_optimizer(lr=1e-4, total_steps=400_000, grad_clip=5.0)


def levocr_recipe(model, cfg) -> Tuple[Callable, Any]:
    """Mutable (BatchNorm in ABINet/conv) recipe; host supplies noised/
    masked/word-prediction sequences + alignment targets
    (ops/levenshtein.ins_del_targets[_native])."""
    from advancedliteratemachinery_tpu.models.levocr import levt_losses

    def loss_fn(params, batch_stats, batch, rng):
        res, nv = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["noised_tokens"], batch["masked_tgt_tokens"],
            batch["word_predictions"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        m = levt_losses(res, batch, cfg)
        return m["loss"], (m, nv["batch_stats"])

    return loss_fn, make_optimizer(lr=1e-4, total_steps=1_200_000, grad_clip=5.0)


def db_recipe(model, k: float = 50.0, alpha: float = 1.0, beta: float = 10.0
              ) -> Tuple[Callable, Any]:
    """DB losses: prob BCE + binary dice-ish BCE + thresh L1 (standard DB).
    batch: images, gt_prob [B,H,W,1], gt_thresh [B,H,W,1], thresh_mask."""

    def loss_fn(params, batch_stats, batch, rng):
        out, nv = model.apply({"params": params, "batch_stats": batch_stats},
                              batch["images"], train=True,
                              mutable=["batch_stats"])

        def bce(p, t):
            p = jnp.clip(p, 1e-6, 1 - 1e-6)
            return -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))

        l_prob = bce(out["prob"], batch["gt_prob"])
        l_bin = bce(out["binary"], batch["gt_prob"])
        tm = batch.get("thresh_mask", jnp.ones_like(batch["gt_thresh"]))
        l_thresh = jnp.sum(jnp.abs(out["thresh"] - batch["gt_thresh"]) * tm
                           ) / jnp.maximum(jnp.sum(tm), 1.0)
        loss = l_prob + alpha * l_bin + beta * l_thresh
        m = {"loss": loss, "prob_loss": l_prob, "binary_loss": l_bin,
             "thresh_loss": l_thresh}
        return loss, (m, nv["batch_stats"])

    return loss_fn, make_optimizer(lr=7e-3, total_steps=100_000, grad_clip=5.0)


def geolayoutlm_recipe(model) -> Tuple[Callable, Any]:
    """batch: the VIE dict + bio_labels / el_labels / el_label_mask
    (reference PL module: AdamW lr 5e-5, linear warmup-decay,
    lightning_modules/geolayoutlm_vie_module.py)."""
    from advancedliteratemachinery_tpu.models.geolayoutlm import (
        geolayoutlm_losses)

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch, deterministic=False,
                          rngs={"dropout": rng})
        m = geolayoutlm_losses(out, batch)
        return m["loss"], m

    return loss_fn, make_optimizer(lr=5e-5, total_steps=100_000,
                                   grad_clip=1.0, warmup_steps=1_000)


def vlpt_recipe(model) -> Tuple[Callable, Any]:
    """batch: images, ids/masks for MLM + contrast (reference main.py:95 —
    AdamW + apex AMP/syncBN; here bf16 + pjit-averaged BatchNorm stats, so
    use make_mutable_train_step)."""
    from advancedliteratemachinery_tpu.models.vlpt import vlpt_losses

    def loss_fn(params, batch_stats, batch, rng):
        out, nv = model.apply({"params": params, "batch_stats": batch_stats},
                              batch, train=True, mutable=["batch_stats"],
                              rngs={"dropout": rng})
        m = vlpt_losses(out, batch)
        return m["loss"], (m, nv["batch_stats"])

    return loss_fn, make_optimizer(lr=1e-4, total_steps=200_000,
                                   grad_clip=1.0, warmup_steps=2_500)


def webrpg_recipe(model, cfg, freeze_vae: bool = True) -> Tuple[Callable, Any]:
    """batch: html embeddings + parameter ids. The reference trains the
    element VAE separately and keeps it FROZEN during AR training
    (trainer_ar.py:128 loads a pretrained VAE) — otherwise the AR latents
    chase a moving target and the joint loss diverges, so the optimizer
    zeroes VAE gradients by default. cfg: WebRPGConfig (loss weights)."""
    import optax

    from advancedliteratemachinery_tpu.models.webrpg import webrpg_losses

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch, rng,
                          rngs={"dropout": rng})
        m = webrpg_losses(out, batch, cfg)
        return m["loss"], m

    tx = make_optimizer(lr=5e-5, total_steps=300_000, grad_clip=1.0,
                        warmup_steps=2_000)
    if freeze_vae:
        def label(params):
            return {k: ("frozen" if k == "vae" else "train") for k in params}
        tx = optax.multi_transform({"train": tx,
                                    "frozen": optax.set_to_zero()}, label)
    return loss_fn, tx


def trcg_recipe(model, n_image_tokens: int) -> Tuple[Callable, Any]:
    """LoRA fine-tuning: frozen base, trained adapters — the optimizer IS
    the freezing mechanism (reference DeepSpeed ZeRO-3 + LoRA r=128;
    scripts/finetune_flash_attn.sh)."""
    from advancedliteratemachinery_tpu.models.trcg import (
        lora_optimizer, trcg_loss)

    def loss_fn(params, batch, rng):
        logits = model.apply({"params": params}, batch["images"],
                             batch["input_ids"], deterministic=False,
                             rngs={"dropout": rng})
        loss = trcg_loss(logits, batch["input_ids"], n_image_tokens)
        return loss, {"loss": loss}

    return loss_fn, lora_optimizer()


RECIPES: Dict[str, Callable] = {
    "mgp_str": mgp_str_recipe,
    "lister": lister_recipe,
    "omniparser": omniparser_recipe,
    "lore": lore_recipe,
    "levocr": levocr_recipe,
    "db_detector": db_recipe,
    "geolayoutlm": geolayoutlm_recipe,
    "vlpt": vlpt_recipe,
    "webrpg": webrpg_recipe,
    "trcg": trcg_recipe,
}


def lvtr_recipe(model, recognizer, rec_params, cfg) -> Tuple[Callable, Any]:
    """LVTR diffusion training (reference train_lvtr.py:297-344):
    eps-MSE + masked background MSE + OCR-aware feature loss through the
    FROZEN ExCTC recognizer (rec_params closed over, never optimized —
    the reference loads recognizer.pth and freezes it). batch: x0 +
    the condition maps + text_ids."""
    from advancedliteratemachinery_tpu.models.lvtr import DDPM

    ddpm = DDPM(cfg)
    cond_keys = ("images_style", "images_removal", "images_render",
                 "line_poly_mask", "word_poly_mask", "text_ids")

    def loss_fn(params, batch, rng):
        conditions = {k: batch[k] for k in cond_keys}
        m = ddpm.training_losses(
            lambda p, x, t, c: model.apply({"params": p}, x, t, c),
            lambda rp, im: recognizer.apply(
                {"params": rp}, im, method=recognizer.get_image_features),
            params, rec_params, batch["x0"], conditions, rng)
        return m["loss"], m

    return loss_fn, make_optimizer(lr=1e-4, total_steps=5_000_000,
                                   grad_clip=1.0, weight_decay=0.01)


RECIPES["lvtr"] = lvtr_recipe


def vgt_recipe(detector) -> Tuple[Callable, Any]:
    """VGT cascade detection training (reference VGTTrainer = detectron2
    DefaultTrainer: AdamW + warmup; RPN + CascadeROIHeads losses —
    models/rcnn.py cascade_train_losses). batch (B=1 pages, like the
    detectron2 loop's per-image processing): images [1,H,W,3],
    grid_ids [1,h,w], gt_boxes [G,4] xyxy, gt_classes [G], gt_valid [G]."""
    from advancedliteratemachinery_tpu.models.rcnn import VGTCascadeDetector

    def loss_fn(params, batch_stats, batch, rng):
        # mutable: the VGT grid-FPN carries one BatchNorm
        m, nv = detector.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["grid_ids"], batch["gt_boxes"],
            batch["gt_classes"], batch["gt_valid"], rng,
            method=VGTCascadeDetector.train_losses,
            mutable=["batch_stats"])
        return m["loss"], (m, nv["batch_stats"])

    return loss_fn, make_optimizer(lr=2e-4, total_steps=200_000,
                                   grad_clip=1.0, weight_decay=0.05,
                                   warmup_steps=1_000)


RECIPES["vgt"] = vgt_recipe


def gem_swde_recipe(model) -> Tuple[Callable, Any]:
    """GEM SWDE attribute extraction (reference run_swde/run.py train:
    AdamW + linear warmup, token-classification CE with -100 ignore).
    batch: the GEMEncoder dict + labels [B, S]."""

    def loss_fn(params, batch, rng):
        logits = model.apply({"params": params}, batch,
                             deterministic=False, rngs={"dropout": rng})
        labels = batch["labels"]
        valid = (labels != -100).astype(jnp.float32)
        safe = jnp.where(labels == -100, 0, labels)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
        loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss, {"loss": loss}

    return loss_fn, make_optimizer(lr=2e-5, total_steps=50_000,
                                   grad_clip=1.0, warmup_steps=1_000)


RECIPES["gem_swde"] = gem_swde_recipe


def gem_websrc_recipe(model) -> Tuple[Callable, Any]:
    """GEM WebSRC span QA (reference run_websrc/run.py: squad-style
    start/end CE averaged, positions clamped to the sequence). batch: the
    GEMEncoder dict + start_positions/end_positions [B]."""

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch,
                          deterministic=False, rngs={"dropout": rng})

        def ce(logits, pos):
            S = logits.shape[-1]
            pos = jnp.clip(pos, 0, S - 1)
            mask = jnp.where(batch["attention_mask"] > 0, 0.0, -1e9)
            logp = jax.nn.log_softmax(logits + mask, -1)
            return -jnp.mean(jnp.take_along_axis(
                logp, pos[:, None].astype(jnp.int32), -1)[:, 0])

        loss = 0.5 * (ce(out["start_logits"], batch["start_positions"])
                      + ce(out["end_logits"], batch["end_positions"]))
        return loss, {"loss": loss}

    return loss_fn, make_optimizer(lr=1e-5, total_steps=50_000,
                                   grad_clip=1.0, warmup_steps=1_000)


RECIPES["gem_websrc"] = gem_websrc_recipe


def webrpg_vae_recipe(model, cfg) -> Tuple[Callable, Any]:
    """Stage-1 WebRPG: pretrain the element VAE alone (the reference
    trains it separately and the AR stage loads it frozen —
    trainer_ar.py:128). batch: param_ids [B, N, T] + element_mask [B, N];
    model: models.webrpg.ElementVAE."""
    from advancedliteratemachinery_tpu.models.webrpg import vae_loss

    def loss_fn(params, batch, rng):
        B, N, T = batch["param_ids"].shape
        flat = batch["param_ids"].reshape(B * N, T)
        recon, mu, logvar, _ = model.apply({"params": params}, flat, rng)
        m = vae_loss(recon, flat, mu, logvar, cfg.kld_weight)
        m["loss"] = m.pop("vae_loss")
        return m["loss"], m

    return loss_fn, make_optimizer(lr=1e-4, total_steps=100_000,
                                   grad_clip=1.0, warmup_steps=500)


RECIPES["webrpg_vae"] = webrpg_vae_recipe
