"""Pure-JAX PPO for Safe-RL WMPC training.

Replaces the reference's stable-baselines3 PPO (rl_training.py:102-166) with
an on-device implementation: rollouts are a `lax.scan` over the vmapped env
batch (the env itself contains the batched NMPC closed loop), GAE + clipped
surrogate + value/entropy losses, optax Adam with the reference's
exponentially-decaying learning-rate schedule, minibatched epochs.

Hyperparameter defaults mirror _config/rl_config.yaml (n_steps 512, batch
4096, epochs 5, gamma 0.8, gae_lambda 0.98, clip 0.2, ent_coef 0.006,
vf_coef 0.5, max_grad_norm 0.5, net [128, 256, 128]).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tum_control_tpu.learn.policy import init_mlp_policy


class PPOConfig(NamedTuple):
    n_envs: int = 16
    n_steps: int = 512
    batch_size: int = 4096
    n_epochs: int = 5
    gamma: float = 0.8
    gae_lambda: float = 0.98
    clip_range: float = 0.2
    ent_coef: float = 0.006
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    lr_init: float = 0.005
    lr_final: float = 0.0001
    lr_decay: float = 0.4          # adaptive_lr_decay (reference helpers.py:88-98)
    total_steps: int = 1_500_000


class EvalCallback:
    """Periodic deterministic evaluation + best-model checkpointing (the
    reference's SB3 EvalCallback wiring, rl_training.py:102-166): every
    `eval_freq` updates the current policy is evaluated from fixed reset
    keys; a new best mean reward saves `best_model/policy_weights.npz`
    under `out_dir`, and `evaluations.npz` accumulates the history."""

    def __init__(self, trainer, out_dir: str, eval_freq: int = 5, seed: int = 123,
                 n_envs: int = None, n_steps: int = None):
        import os

        self.trainer = trainer
        self.out_dir = out_dir
        self.eval_freq = max(1, eval_freq)
        self.key = jax.random.PRNGKey(seed)  # fixed: comparable across evals
        self.n_envs, self.n_steps = n_envs, n_steps
        self.best = -np.inf
        self.history = []
        os.makedirs(os.path.join(out_dir, "best_model"), exist_ok=True)
        # resume (--cont into the same out dir): keep the previous best and
        # history instead of clobbering the old checkpoint with a worse one
        prev = os.path.join(out_dir, "evaluations.npz")
        if os.path.exists(prev):
            d = np.load(prev)
            self.history = list(zip(d["updates"].tolist(), d["mean_reward"].tolist()))
            if len(self.history):
                self.best = float(np.max(d["mean_reward"]))
                print(f"EvalCallback: resuming, previous best {self.best:.4f}")

    def __call__(self, update, policy, metrics):
        if update % self.eval_freq:
            return
        self._evaluate_and_save(update, policy)

    def finalize(self, policy):
        """Evaluate the final policy regardless of eval_freq alignment (PPO
        typically peaks late; without this the last eval_freq-1 updates are
        never considered for best_model)."""
        last = self.history[-1][0] if self.history else -1
        self._evaluate_and_save(max(last + 1, 0), policy)

    def _evaluate_and_save(self, update, policy):
        import os

        from tum_control_tpu.learn.policy import save_policy_npz

        r = self.trainer.evaluate(policy, self.key, self.n_envs, self.n_steps)
        self.history.append((update, r))
        np.savez(
            os.path.join(self.out_dir, "evaluations.npz"),
            updates=np.array([h[0] for h in self.history]),
            mean_reward=np.array([h[1] for h in self.history]),
        )
        marker = ""
        if r > self.best:
            self.best = r
            save_policy_npz(
                policy, os.path.join(self.out_dir, "best_model", "policy_weights.npz")
            )
            marker = " (new best, saved)"
        print(f"eval @ update {update}: mean reward {r:.4f}{marker}", flush=True)


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def lr_schedule(cfg: PPOConfig):
    """Reference schedule: lr = init * (final/init)^(progress * k)
    (helpers.learning_rate_schedule, k = adaptive_lr_decay)."""
    n_updates = max(cfg.total_steps // (cfg.n_envs * cfg.n_steps), 1)
    total_opt_steps = n_updates * cfg.n_epochs * max(
        cfg.n_envs * cfg.n_steps // cfg.batch_size, 1
    )

    def fn(count):
        progress = jnp.clip(count / total_opt_steps, 0.0, 1.0)
        return cfg.lr_init * (cfg.lr_final / cfg.lr_init) ** (progress * cfg.lr_decay)

    return fn


class PPOTrainer:
    def __init__(self, env, cfg: PPOConfig = PPOConfig(), seed: int = 0):
        self.env = env
        self.cfg = cfg
        key = jax.random.PRNGKey(seed)
        self.policy = init_mlp_policy(key, env.n_observations, env.n_actions)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(lr_schedule(cfg)),
        )
        self.opt_state = self.tx.init(self.policy)
        self._update = jax.jit(self._update_impl)

    # ------------------------------------------------------------------
    def init_envs(self, key):
        keys = jax.random.split(key, self.cfg.n_envs)
        return jax.vmap(self.env.reset)(keys)

    # ------------------------------------------------------------------
    def _rollout(self, policy, es, obs, key):
        cfg = self.cfg

        def step(carry, _):
            es, obs, key = carry
            key, ka = jax.random.split(key)
            logits = policy.logits(obs)
            action = jax.random.categorical(ka, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(cfg.n_envs), action]
            value = policy.value(obs)
            es, obs_next, reward, done = jax.vmap(self.env.step)(es, action)
            tr = Transition(obs, action, logp, value, reward, done)
            return (es, obs_next, key), tr

        (es, obs, key), traj = jax.lax.scan(
            step, (es, obs, key), None, length=cfg.n_steps
        )
        last_value = policy.value(obs)
        return es, obs, key, traj, last_value

    def _gae(self, traj: Transition, last_value):
        cfg = self.cfg

        def body(carry, tr):
            adv_next, v_next = carry
            nonterm = 1.0 - tr.done.astype(tr.value.dtype)
            delta = tr.reward + cfg.gamma * v_next * nonterm - tr.value
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterm * adv_next
            return (adv, tr.value), adv

        _, advs = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
        )
        return advs, advs + traj.value

    def _loss(self, policy, batch, adv, ret):
        cfg = self.cfg
        logits = policy.logits(batch.obs)
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(logp_all, batch.action[:, None], axis=1)[:, 0]
        ratio = jnp.exp(logp - batch.logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - cfg.clip_range, 1 + cfg.clip_range) * adv_n,
        ).mean()
        v = policy.value(batch.obs)
        v_loss = jnp.mean((v - ret) ** 2)
        ent = -jnp.sum(jax.nn.softmax(logits) * logp_all, axis=1).mean()
        return pg + cfg.vf_coef * v_loss - cfg.ent_coef * ent, (pg, v_loss, ent)

    def _update_impl(self, policy, opt_state, es, obs, key):
        cfg = self.cfg
        es, obs, key, traj, last_value = self._rollout(policy, es, obs, key)
        advs, rets = self._gae(traj, last_value)

        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), traj)
        advs_f, rets_f = advs.reshape(-1), rets.reshape(-1)
        n = advs_f.shape[0]
        n_mb = max(n // cfg.batch_size, 1)

        def epoch(carry, _):
            policy, opt_state, key = carry
            key, kp = jax.random.split(key)
            perm = jax.random.permutation(kp, n)

            def minibatch(carry, idx):
                policy, opt_state = carry
                mb = jax.tree.map(lambda a: a[idx], flat)
                (l, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                    policy, mb, advs_f[idx], rets_f[idx]
                )
                updates, opt_state = self.tx.update(grads, opt_state)
                policy = optax.apply_updates(policy, updates)
                return (policy, opt_state), l

            idxs = perm[: n_mb * cfg.batch_size].reshape(n_mb, cfg.batch_size)
            (policy, opt_state), losses = jax.lax.scan(
                minibatch, (policy, opt_state), idxs
            )
            return (policy, opt_state, key), losses.mean()

        (policy, opt_state, key), losses = jax.lax.scan(
            epoch, (policy, opt_state, key), None, length=cfg.n_epochs
        )
        metrics = {
            "loss": losses.mean(),
            "reward_mean": traj.reward.mean(),
            "episode_done_frac": traj.done.mean(),
        }
        return policy, opt_state, es, obs, key, metrics

    # ------------------------------------------------------------------
    def evaluate(self, policy, key, n_envs: int = None, n_steps: int = None):
        """Deterministic-policy evaluation from fixed reset keys: mean reward
        per env-step over a fixed horizon (the EvalCallback metric,
        reference rl_training.py:102-166 / SB3 EvalCallback)."""
        n_envs = n_envs or self.cfg.n_envs
        n_steps = n_steps or min(self.cfg.n_steps, 128)
        if not hasattr(self, "_eval_fn") or self._eval_shape != (n_envs, n_steps):
            self._eval_shape = (n_envs, n_steps)

            def run(policy, key):
                keys = jax.random.split(key, n_envs)
                es, obs = jax.vmap(self.env.reset)(keys)

                def step(carry, _):
                    es, obs = carry
                    action = jnp.argmax(policy.logits(obs), axis=-1)
                    es, obs, reward, done = jax.vmap(self.env.step)(es, action)
                    return (es, obs), reward

                _, rewards = jax.lax.scan(step, (es, obs), None, length=n_steps)
                return rewards.mean()

            self._eval_fn = jax.jit(run)
        return float(self._eval_fn(policy, key))

    def train(self, n_updates: int, key=None, log_every: int = 1, callback=None):
        key = jax.random.PRNGKey(1) if key is None else key
        key, ke = jax.random.split(key)
        es, obs = self.init_envs(ke)
        history = []
        for u in range(n_updates):
            self.policy, self.opt_state, es, obs, key, m = self._update(
                self.policy, self.opt_state, es, obs, key
            )
            m = {k: float(v) for k, v in m.items()}
            history.append(m)
            if u % log_every == 0:
                print(f"update {u}: {m}", flush=True)
            if callback is not None:
                callback(u, self.policy, m)
        return history
