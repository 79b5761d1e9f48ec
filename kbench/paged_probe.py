"""Measure the paged-optimizer prefetch-overlap claim (VERDICT r3 #9).

The reference overlaps the *next* parameter's H2D state page-in with the
current parameter's update math (mps_bitsandbytes/optim/paged.py:107-156).
This probe times, on the real chip, K full PagedAdamW.step() calls under
three dispatch orders:

  prefetch   — lookahead order (page-in i+1 issued before compute i)
  at-use     — page-in i immediately before compute i (no lookahead);
               the SHIPPED order since round 5
  resident   — page_to_cpu=False (states never leave the device; the
               overlap-free lower bound on the step's compute+dispatch)

MEASURED round 5 (8 leaves x 32 MB of states per leaf per direction):
prefetch 15916.8 ms/step vs at-use 11644.6 — ratio 1.367, i.e. NO
overlap from JAX async dispatch on this host transport; the lookahead
only widens peak in-flight transfer. optim/paged.py therefore pages each
leaf in at use; KERNEL_NOTES round 5 records the verdict.

Run: python -m kbench.paged_probe [--leaves 12] [--rows 2048] [--steps 5]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from tpu_bitsandbytes.optim.paged import PagedAdamW, _adam_leaf_step


def _params(n_leaves, rows, cols, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), n_leaves)
    return {f"w{i}": jax.random.normal(ks[i], (rows, cols), jnp.float32) * .02
            for i in range(n_leaves)}


def _sync(opt):
    opt.synchronize()


def time_steps(opt, grads, n_steps, lookahead=False):
    """Wall time of n_steps full optimizer steps (median-free total/step —
    page-in/page-out dominate; K steps amortize the first-dispatch compile).
    ``lookahead=True`` replaces the step loop with the prefetch order
    (leaf i+1's page-in issued before leaf i's compute); the shipped
    ``opt.step`` pages at use."""
    if lookahead:
        def step_lookahead(self, g, params=None):
            if params is not None:
                self.params = params
            flat_p = self._flat_params()
            flat_g = self._treedef.flatten_up_to(g)
            if self.state is None:
                self.state = [
                    self._init_state_leaf(p, ("exp_avg", "exp_avg_sq"))
                    for p in flat_p]
            self.step_count += 1
            step = float(self.step_count)
            new_flat = []
            n = len(flat_p)
            staged = [None] * n
            if n:
                staged[0] = self._page_in(0)
            for i in range(n):
                if i + 1 < n:
                    staged[i + 1] = self._page_in(i + 1)   # lookahead
                m, v = staged[i]
                p_new, m_new, v_new = _adam_leaf_step(
                    flat_p[i], m, v, flat_g[i], step, self.lr,
                    self.betas[0], self.betas[1], self.eps,
                    self.weight_decay, self._is_adamw)
                self._page_out(i, exp_avg=m_new, exp_avg_sq=v_new)
                new_flat.append(p_new)
            self.params = self._treedef.unflatten(new_flat)
            return self.params

        runner = lambda g: step_lookahead(opt, g)
    else:
        runner = opt.step

    runner(grads)              # state init + compile
    _sync(opt)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        runner(grads)
    _sync(opt)
    return (time.perf_counter() - t0) / n_steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=12)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--cols", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    params = _params(args.leaves, args.rows, args.cols)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-3, params)
    state_mb = args.rows * args.cols * 4 * 2 / 2**20
    print(f"{args.leaves} leaves x [{args.rows}, {args.cols}] f32; "
          f"{state_mb:.0f} MB of states paged per leaf per direction")

    ms = {}
    for name, kw, lookahead in (
            ("resident", dict(page_to_cpu=False), False),
            ("at-use", dict(page_to_cpu=True), False),
            ("prefetch", dict(page_to_cpu=True), True)):
        opt = PagedAdamW(jax.tree_util.tree_map(jnp.copy, params),
                         lr=1e-3, **kw)
        ms[name] = time_steps(opt, grads, args.steps, lookahead=lookahead)
        print(f"  {name:9s} {ms[name]:9.1f} ms/step")
    ratio = ms["prefetch"] / ms["at-use"]
    print(f"prefetch/at-use = {ratio:.3f} "
          f"({'overlap REAL' if ratio < 0.97 else 'no measurable overlap'})")


if __name__ == "__main__":
    main()
