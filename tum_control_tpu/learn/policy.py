"""Actor-critic MLP policy (SB3 MlpPolicy-compatible) in pure JAX.

The reference trains/loads PPO policies with stable-baselines3
(rl_training.py:102-155; inference at NMPC_class.py:233). SB3 is not
available here; instead the committed checkpoints' `policy.pth` tensors are
converted to npz (data/wmpc_models/<name>/policy_weights.npz, converter in
tools/convert_sb3_checkpoint.py) and applied as a plain tanh MLP:

    obs -> policy_net [128, 256, 128] (tanh) -> action_net logits
        -> value_net head for the critic

`deterministic predict` = argmax of the logits, matching SB3's categorical
policy for discrete action spaces.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MLPPolicy(NamedTuple):
    pi_w: tuple  # policy trunk weights ((in,out) matrices)
    pi_b: tuple
    vf_w: tuple
    vf_b: tuple
    act_w: jnp.ndarray
    act_b: jnp.ndarray
    val_w: jnp.ndarray
    val_b: jnp.ndarray

    def logits(self, obs):
        h = obs
        for w, b in zip(self.pi_w, self.pi_b):
            h = jnp.tanh(h @ w + b)
        return h @ self.act_w + self.act_b

    def value(self, obs):
        h = obs
        for w, b in zip(self.vf_w, self.vf_b):
            h = jnp.tanh(h @ w + b)
        return (h @ self.val_w + self.val_b)[..., 0]

    def predict(self, obs):
        """Deterministic discrete action (argmax over logits)."""
        return jnp.argmax(self.logits(obs), axis=-1)

    def action_probabilities(self, obs):
        """Softmax action distribution (helpers.get_action_probabilities)."""
        import jax

        return jax.nn.softmax(self.logits(obs), axis=-1)


def load_sb3_policy(npz_path: str) -> MLPPolicy:
    """Load a converted SB3 checkpoint (torch tensors are (out,in) — transpose)."""
    d = np.load(npz_path)
    g = lambda k: jnp.asarray(d[k])

    def trunk(prefix):
        ws, bs = [], []
        for i in (0, 2, 4):
            ws.append(g(f"mlp_extractor__{prefix}__{i}__weight").T)
            bs.append(g(f"mlp_extractor__{prefix}__{i}__bias"))
        return tuple(ws), tuple(bs)

    pi_w, pi_b = trunk("policy_net")
    vf_w, vf_b = trunk("value_net")
    return MLPPolicy(
        pi_w=pi_w,
        pi_b=pi_b,
        vf_w=vf_w,
        vf_b=vf_b,
        act_w=g("action_net__weight").T,
        act_b=g("action_net__bias"),
        val_w=g("value_net__weight").T,
        val_b=g("value_net__bias"),
    )


def save_policy_npz(policy: MLPPolicy, npz_path: str):
    """Save in the converted-SB3 npz layout (inverse of load_sb3_policy),
    so trained and converted checkpoints are interchangeable."""
    arrs = {}
    for i, (w, b) in enumerate(zip(policy.pi_w, policy.pi_b)):
        arrs[f"mlp_extractor__policy_net__{2*i}__weight"] = np.asarray(w).T
        arrs[f"mlp_extractor__policy_net__{2*i}__bias"] = np.asarray(b)
    for i, (w, b) in enumerate(zip(policy.vf_w, policy.vf_b)):
        arrs[f"mlp_extractor__value_net__{2*i}__weight"] = np.asarray(w).T
        arrs[f"mlp_extractor__value_net__{2*i}__bias"] = np.asarray(b)
    arrs["action_net__weight"] = np.asarray(policy.act_w).T
    arrs["action_net__bias"] = np.asarray(policy.act_b)
    arrs["value_net__weight"] = np.asarray(policy.val_w).T
    arrs["value_net__bias"] = np.asarray(policy.val_b)
    np.savez(npz_path, **arrs)


def init_mlp_policy(key, obs_dim: int, n_actions: int, hidden=(128, 256, 128)) -> MLPPolicy:
    """Fresh orthogonal-ish initialization for training from scratch."""
    import jax

    def dense(key, fan_in, fan_out, scale):
        a = jax.random.normal(key, (fan_in, fan_out))
        q, _ = jnp.linalg.qr(a) if fan_in >= fan_out else jnp.linalg.qr(a.T)
        q = q if fan_in >= fan_out else q.T
        return scale * q[:fan_in, :fan_out]

    keys = jax.random.split(key, 2 * len(hidden) + 2)
    dims = [obs_dim, *hidden]
    pi_w = tuple(dense(keys[i], dims[i], dims[i + 1], np.sqrt(2)) for i in range(len(hidden)))
    vf_w = tuple(
        dense(keys[len(hidden) + i], dims[i], dims[i + 1], np.sqrt(2))
        for i in range(len(hidden))
    )
    zb = lambda n: tuple(jnp.zeros(d) for d in n)
    return MLPPolicy(
        pi_w=pi_w,
        pi_b=zb(hidden),
        vf_w=vf_w,
        vf_b=zb(hidden),
        act_w=dense(keys[-2], hidden[-1], n_actions, 0.01),
        act_b=jnp.zeros(n_actions),
        val_w=dense(keys[-1], hidden[-1], 1, 1.0),
        val_b=jnp.zeros(1),
    )
