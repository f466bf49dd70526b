"""Single pjit train engine.

Replaces the reference's six engine styles (SURVEY.md §1 L3) with one
sharded train-step builder: loss → grad → clip → optax update, compiled once
over a (data, fsdp, model) mesh. Gradient sync is the XLA-inserted
reduction over the data axis (what DDP's NCCL allreduce does in e.g.
MGP-STR train_final_dist.py:76), and parameter sharding over fsdp replaces
DeepSpeed ZeRO (SceneVTG TRCG zero3.json).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from advancedliteratemachinery_tpu.parallel.mesh import batch_spec
from advancedliteratemachinery_tpu.parallel.sharding import infer_param_specs


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_optimizer(
    lr: float = 1e-4,
    total_steps: int = 2_000_000,
    grad_clip: float = 5.0,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """Adam + cosine schedule + global-norm clip (reference: MGP-STR
    train_final_dist.py:100 Adam(beta1=0.9), :105 cosine schedule, :165
    clip_grad_norm_(5))."""
    if warmup_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, total_steps)
    else:
        sched = optax.cosine_decay_schedule(lr, total_steps)
    opt = (optax.adamw(sched, weight_decay=weight_decay) if weight_decay > 0
           else optax.adam(sched))
    return optax.chain(optax.clip_by_global_norm(grad_clip), opt)


def cross_entropy_ignore_pad(logits: jnp.ndarray, targets: jnp.ndarray,
                             ignore_id: int = 0) -> jnp.ndarray:
    """Mean CE over non-ignored positions (reference: CrossEntropyLoss(
    ignore_index=0), train_final_dist.py:85)."""
    logits = logits.astype(jnp.float32)
    valid = (targets != ignore_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(nll * valid) / denom


def mgp_str_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
                 ) -> Dict[str, jnp.ndarray]:
    """Sum of 3 granularity CE losses (train_final_dist.py:150-153)."""
    char_loss = cross_entropy_ignore_pad(outputs["char"], batch["char_ids"])
    bpe_loss = cross_entropy_ignore_pad(outputs["bpe"], batch["bpe_ids"])
    wp_loss = cross_entropy_ignore_pad(outputs["wp"], batch["wp_ids"])
    return {
        "loss": char_loss + bpe_loss + wp_loss,
        "char_loss": char_loss,
        "bpe_loss": bpe_loss,
        "wp_loss": wp_loss,
    }


def state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """A TrainState-shaped pytree of NamedShardings: params (and the
    structurally-matching adam mu/nu) follow `infer_param_specs`; scalars and
    schedule counters are replicated."""
    repl = NamedSharding(mesh, P())

    def tree_shardings(tree):
        specs = infer_param_specs(tree, mesh)
        return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                            is_leaf=lambda s: isinstance(s, P))

    return TrainState(
        step=repl,
        params=tree_shardings(state.params),
        opt_state=tree_shardings(state.opt_state),
        tx=state.tx,
    )


def make_train_step(
    loss_fn: Callable[[Any, Dict[str, jnp.ndarray], jax.Array], Any],
    state: TrainState,
    mesh: Mesh,
    donate: bool = True,
):
    """Generic sharded train step. `loss_fn(params, batch, rng) -> (loss, metrics)`.

    Returns (jitted_step, state_shardings). Put `state` and batches on the
    returned shardings before calling.
    """
    shardings = state_shardings(state, mesh)
    bspec = NamedSharding(mesh, batch_spec())
    repl = NamedSharding(mesh, P())

    def step_fn(st: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(st.params, batch, rng)
        new_state = st.apply_gradients(grads)
        return new_state, metrics

    if mesh.size == 1:
        # On a 1-device mesh every NamedSharding is semantically a no-op,
        # and on the experimental axon TPU backend sharding annotations
        # route the full TrainState through the host every step (measured
        # 4.1s vs 0.24s per MGP-STR-base step at B=128) — plain jit keeps
        # identical semantics without the pathology.
        jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
        return jitted, shardings

    jitted = jax.jit(
        step_fn,
        in_shardings=(shardings, bspec, repl),
        out_shardings=(shardings, repl),
        donate_argnums=(0,) if donate else (),
    )
    return jitted, shardings


def make_mgp_str_train_step(model, state: TrainState, mesh: Mesh, donate: bool = True):
    """MGP-STR train step: batch = {"images" [B,32,128,3], "char_ids"/
    "bpe_ids"/"wp_ids" [B,T] i32}."""

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["images"],
                          deterministic=False, rngs={"dropout": rng})
        metrics = mgp_str_loss(out, batch)
        return metrics["loss"], metrics

    return make_train_step(loss_fn, state, mesh, donate=donate)
