"""EMA parity: params AND BN running stats decay together.

timm's ModelEma (used by the reference, deit/main.py:297-304) deep-copies
the whole module and updates every state_dict entry — buffers included —
as e = d*e + (1-d)*m.  Round-1 tracked only params (VERDICT missing #4);
these tests pin the full contract with a hand-rolled reference update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from mrla_tpu.train import create_train_state, make_eval_step, make_train_step


class _ToyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = jax.nn.relu(x).mean(axis=(1, 2))
        return nn.Dense(4)(x)


def _batch(seed, b=4):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.standard_normal((b, 8, 8, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 4, (b,)), jnp.int32),
    }


def test_ema_tracks_params_and_batch_stats():
    decay = 0.9
    model = _ToyBN()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 8, 8, 3)),
        optax.sgd(0.1), ema_decay=decay,
    )
    step = jax.jit(make_train_step())

    # hand-rolled reference EMA trajectory
    ema_p = jax.tree.map(lambda x: np.asarray(x), state.params)
    ema_bs = jax.tree.map(lambda x: np.asarray(x), state.batch_stats)
    for i in range(3):
        state, _ = step(state, _batch(i), jax.random.key(i))
        ema_p = jax.tree.map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p),
            ema_p, state.params,
        )
        ema_bs = jax.tree.map(
            lambda e, s: decay * e + (1 - decay) * np.asarray(s),
            ema_bs, state.batch_stats,
        )

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, np.asarray(b), rtol=1e-5),
        ema_p, state.ema_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, np.asarray(b), rtol=1e-5),
        ema_bs, state.ema_batch_stats,
    )
    # EMA state must differ from the raw state after updates
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.batch_stats)[0]),
        np.asarray(jax.tree.leaves(state.ema_batch_stats)[0]),
    )


def test_ema_eval_uses_ema_batch_stats():
    model = _ToyBN()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 8, 8, 3)),
        optax.sgd(0.1), ema_decay=0.5,
    )
    step = jax.jit(make_train_step())
    for i in range(2):
        state, _ = step(state, _batch(i), jax.random.key(i))

    batch = _batch(99)
    logits_ema = model.apply(
        {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
        batch["image"], train=False,
    )
    logits_raw = model.apply(
        {"params": state.ema_params, "batch_stats": state.batch_stats},
        batch["image"], train=False,
    )
    assert not np.allclose(np.asarray(logits_ema), np.asarray(logits_raw)), (
        "EMA eval must see EMA running stats, not raw ones"
    )

    # eval_step(use_ema=True) reproduces the (ema_params, ema_batch_stats) path
    out = make_eval_step(use_ema=True)(state, batch)
    top1 = int(
        (np.argmax(np.asarray(logits_ema), -1) == np.asarray(batch["label"])).sum()
    )
    assert int(out["top1"]) == top1


def test_ema_eval_without_ema_state_fails_loudly():
    model = _ToyBN()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 8, 8, 3)), optax.sgd(0.1)
    )
    with pytest.raises(ValueError, match="ema"):
        make_eval_step(use_ema=True)(state, _batch(0))


def test_ema_state_survives_donating_jit():
    """create_train_state must give EMA trees DISTINCT buffers: the CLI's
    donating train step (train/cli.py donate_argnums=(0,)) faults with
    "attempt to donate the same buffer twice" when ema_params aliases
    params (caught by the round-3 full-recipe on-chip smoke)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mrla_tpu.train import create_train_state, make_train_step

    model = _ToyBN()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 8, 8, 3)),
        optax.sgd(0.1), ema_decay=0.9,
    )
    step = jax.jit(make_train_step(), donate_argnums=(0,))
    new_state, metrics = step(state, _batch(0), jax.random.key(1))
    assert bool(jnp.isfinite(metrics["loss"]))
