"""Engine extensions: BN-stats training, gradient accumulation, schedules.

Completes the single-engine story (SURVEY.md §7.6) for the model families
with BatchNorm (LORE/DLA, DB, ABINet/LevOCR, VLPT) and for the reference's
gradient-accumulation configs (SceneVTG LVTR accelerate
gradient_accumulation_steps — cfgs_lvtr.py:28; TRCG HF args):

- `MutableTrainState` carries a `batch_stats` collection next to params.
- `make_mutable_train_step` builds a sharded jit step whose loss_fn returns
  (loss, (metrics, new_batch_stats)).
- `with_accumulation` wraps any optax tx in optax.MultiSteps.
- `warmup_cosine` / `warmup_linear`: the two schedule shapes the reference
  uses (OmniParser warmup_steps + linear, LISTER cosine, TRCG cosine).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from advancedliteratemachinery_tpu.engine.train import state_shardings
from advancedliteratemachinery_tpu.parallel.mesh import batch_spec
from advancedliteratemachinery_tpu.parallel.sharding import infer_param_specs


class MutableTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=new_batch_stats, opt_state=new_opt)


def mutable_state_shardings(state: MutableTrainState, mesh: Mesh
                            ) -> MutableTrainState:
    repl = NamedSharding(mesh, P())

    def tree_shardings(tree):
        specs = infer_param_specs(tree, mesh)
        return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                            is_leaf=lambda s: isinstance(s, P))

    return MutableTrainState(
        step=repl, params=tree_shardings(state.params),
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=tree_shardings(state.opt_state), tx=state.tx)


def make_mutable_train_step(loss_fn: Callable, state: MutableTrainState,
                            mesh: Mesh, donate: bool = True):
    """loss_fn(params, batch_stats, batch, rng) ->
    (loss, (metrics, new_batch_stats)). BatchNorm stats are averaged
    implicitly over the data axis by pjit (the reference needs explicit
    SyncBN conversion — OmniParser model/__init__.py:17)."""
    shardings = mutable_state_shardings(state, mesh)
    bspec = NamedSharding(mesh, batch_spec())
    repl = NamedSharding(mesh, P())

    def step_fn(st: MutableTrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(st.params, st.batch_stats,
                                                   batch, rng)
        return st.apply_gradients(grads, new_stats), metrics

    if mesh.size == 1:
        # plain jit on 1-device meshes (see engine.train.make_train_step:
        # NamedShardings are no-ops there and pathological on axon)
        jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
        return jitted, shardings

    jitted = jax.jit(step_fn, in_shardings=(shardings, bspec, repl),
                     out_shardings=(shardings, repl),
                     donate_argnums=(0,) if donate else ())
    return jitted, shardings


def with_accumulation(tx: optax.GradientTransformation, every: int
                      ) -> optax.GradientTransformation:
    """Gradient accumulation (reference: accelerate `accumulate`,
    train_lvtr.py:297). every=1 is a no-op."""
    if every <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every)


def warmup_linear(lr: float, warmup_steps: int, total_steps: int):
    """OmniParser schedule: linear warmup → linear decay (main.py lr lambda)."""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
        [warmup_steps])


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int):
    return optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, total_steps)
