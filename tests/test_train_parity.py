"""Training-dynamics parity: starting from the reference's exact weights
and data, 5 AdamW training steps must reproduce the reference's per-step
losses — this pins forward, backward (gradients through B-spline bases,
LayerNorm, PReLU) and the optimizer (AdamW + decoupled weight decay)
numerically."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from convkan_tpu.nn.kan_linear import KANLinear
from convkan_tpu.utils.torch_compat import convert_linear as T

from golden_utils import load_golden


class _Stack(fnn.Module):
    g1: tuple
    g2: tuple

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x = KANLinear(input_dim=12, output_dim=8, grid_override=self.g1,
                      param_dtype=jnp.float64)(x, train=train)
        return KANLinear(input_dim=8, output_dim=4, grid_override=self.g2,
                         param_dtype=jnp.float64)(x, train=train)


def test_five_adamw_steps_match_reference():
    x, _, sd = load_golden("train_steps_kan_mlp")
    labels = jnp.asarray(sd["labels"].astype(np.int32))
    ref_losses = sd["losses"]

    g1 = tuple(np.asarray(sd["l1.grid"])[0] if sd["l1.grid"].ndim == 2
               else np.asarray(sd["l1.grid"]))
    g2 = tuple(np.asarray(sd["l2.grid"])[0] if sd["l2.grid"].ndim == 2
               else np.asarray(sd["l2.grid"]))
    model = _Stack(g1=g1, g2=g2)
    xj = jnp.asarray(x)
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)

    def layer_params(prefix, K):
        out = sd[f"{prefix}.base_weight"].shape[0]
        return {
            "base_w": T(sd[f"{prefix}.base_weight"]),
            "spline_w": T(sd[f"{prefix}.spline_weight"].reshape(out, -1)),
            "prelu": np.asarray(sd[f"{prefix}.prelu.weight"]).reshape(()),
            "LayerNorm_0": {
                "weight": sd[f"{prefix}.layer_norm.weight"],
                "bias": sd[f"{prefix}.layer_norm.bias"],
            },
        }

    params = {"KANLinear_0": layer_params("l1", 8),
              "KANLinear_1": layer_params("l2", 8)}

    tx = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-3)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply({"params": p}, xj, train=False)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    losses = []
    for _ in range(5):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))

    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=1e-9,
                               atol=1e-9)
