"""Runtime setup helpers (compilation cache, precision mode)."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None):
    """Enable JAX's persistent compilation cache.

    The full ensemble takes minutes to compile; caching makes every
    subsequent process (bench, CLIs, the driver's compile checks) start in
    seconds. Safe to call multiple times.
    """
    import jax

    # honor JAX_PLATFORMS even though the axon sitecustomize force-registers
    # the TPU platform (CLAUDE.md gotcha): every CLI calls this helper first
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        # keep the host CPU backend available for fast host-side init
        # (model.init on CPU, then device_put) — restricting to the TPU
        # platform alone makes jax.devices("cpu") raise
        if "cpu" not in plat.split(","):
            plat = plat + ",cpu"
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    cache_dir = cache_dir or os.environ.get(
        "FREQFUSION_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax versions: ignore
        pass


def _is_remote_platform() -> bool:
    """True when the default platform is the remote (tunnel-backed) TPU.

    CPU init is local and instant — safe to call in-process. Anything else
    (the axon plugin, which the sitecustomize force-registers even with no
    env set) goes over the tunnel and must be probed out-of-process.
    """
    import jax

    plats = str(jax.config.jax_platforms or
                os.environ.get("JAX_PLATFORMS", "") or "axon")
    return plats.split(",")[0] != "cpu"


def _backend_probe_ok(timeout_s: float) -> bool:
    """Probe backend liveness in a BOUNDED subprocess.

    Two distinct outage modes observed on the remote TPU tunnel (r3):
    (a) init raises UNAVAILABLE immediately, and (b) init HANGS — the
    tunnel accepts the connection but never responds, blocking
    `jax.devices()` inside C code where no Python-level timeout can
    interrupt it. A hung in-process init also holds the tunnel, which can
    block later attempts even after the backend recovers. Probing in a
    child process bounds both modes: the child either prints a device
    count (backend up) or is killed at `timeout_s`.
    """
    import subprocess
    import sys

    # the sitecustomize force-registers the TPU platform even under
    # JAX_PLATFORMS=cpu (CLAUDE.md): pin via jax.config before first use so
    # the probe targets the SAME platform the parent will init
    code = ("import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "if p: jax.config.update('jax_platforms', p)\n"
            "print(len(jax.devices()))\n")
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=timeout_s)
        if res.returncode != 0:
            # surface the child's actual failure (last traceback line):
            # a permanent error (broken install, bad platform value) looks
            # identical to an outage otherwise and burns the whole budget
            # with no diagnostic
            tail = res.stderr.decode(errors="replace").strip().splitlines()
            print(f"# backend probe: {tail[-1] if tail else 'exit '}"
                  f"{'' if tail else res.returncode}",
                  file=sys.stderr, flush=True)
        return res.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(max_wait_s: float | None = None, poll_s: float = 20.0):
    """Block until the default JAX backend initializes, riding out outages.

    The remote TPU tunnel goes down for minutes at a time (multi-hour
    outages observed); a bench/serving process that dies — or hangs — on
    its first `jax.devices()` turns a transient outage into a lost
    measurement. For remote platforms this probes liveness in bounded
    subprocesses (see `_backend_probe_ok`) and only touches the in-process
    backend once a probe succeeds; on CPU it calls `jax.devices()`
    directly. Budget: `FREQFUSION_BACKEND_WAIT` seconds (default 1800),
    then raises. Returns the device list.
    """
    import sys
    import time
    import jax

    if max_wait_s is None:
        # multi-hour outages observed (r3: ≥4.5 h); the driver's bench
        # budget is the real bound — waiting costs nothing when the run
        # would otherwise die with no measurement
        max_wait_s = float(os.environ.get("FREQFUSION_BACKEND_WAIT", "1800"))
    deadline = time.monotonic() + max_wait_s

    remote = _is_remote_platform()
    probe_timeout = float(os.environ.get("FREQFUSION_PROBE_TIMEOUT", "120"))

    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remote:
            # never let the first in-process init be the probe: a hang
            # there is unrecoverable (C-level block, tunnel held open).
            # Residual risk: if the tunnel flaps in the probe→devices()
            # window, this jax.devices() can still hang beyond the budget
            # (no Python timeout reaches it) — accepted, since the probe
            # shrinks the window from the whole outage to milliseconds.
            if _backend_probe_ok(min(probe_timeout, max(remaining, 5.0))):
                return jax.devices()
            err = None
        else:
            try:
                return jax.devices()
            except RuntimeError as e:
                err = e
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            if err is not None:
                raise err
            raise RuntimeError(
                f"backend probe failed for {max_wait_s:.0f}s "
                f"({attempt} attempts); giving up")
        msg = str(err).splitlines()[0] if err else "probe timeout/error"
        print(f"# backend unavailable (attempt {attempt}: {msg}); "
              f"retrying in {poll_s:.0f}s ({remaining:.0f}s left)",
              file=sys.stderr, flush=True)
        try:  # a failed init is cached; drop it so the retry re-inits
            from jax.extend.backend import clear_backends
            clear_backends()
        except Exception:
            pass
        time.sleep(min(poll_s, remaining))


def fast_random_variables(model, *example_args, seed: int = 0):
    """Variables with init-free random values: `jax.eval_shape` the init
    (no FLOPs, no device work) and fill leaves host-side.

    Skipping the real `model.init` forward saves minutes of host CPU on
    the full ensemble (benches, compile checks, and the no-checkpoint
    degraded serving mode). Rank ≤1 scale-like leaves get ones, biases
    zeros, multi-dim projections fan-in-scaled normals, everything else
    N(0, 0.02); batch_stats vars get ones so BN stays finite.
    """
    import jax
    import numpy as np

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed),
                            *example_args)
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        shape, dtype = leaf.shape, leaf.dtype
        # multiplicative/variance-like leaves must be ~1 regardless of rank
        # (a zero or negative BN running_var / temperature blows up the
        # forward, and lax.scan param stacking gives logically-1D leaves
        # leading stack dims); means stay 0
        if (name in ("scale", "gamma", "temperature") or name.endswith("var")
                or name.endswith("scale")):
            return np.ones(shape, dtype)
        if name.endswith("mean"):
            return np.zeros(shape, dtype)
        # torch-layout projection matrices named `*_weight` (TorchMHA's
        # in_proj_weight, mambair's x_proj_weight): fan-in random, NOT ones —
        # an all-ones [C,3C] projection saturates the attention softmax, and
        # this fill is also the production no-checkpoint degraded serving
        # mode (infer/io.py), not just a bench shortcut. Scalar/vector
        # `*_weight` leaves (residual_weight gates) stay ones.
        if name.endswith("_weight"):
            if len(shape) <= 1:
                return np.ones(shape, dtype)
            fan_in = max(int(shape[-2]), 1)  # contraction dim for x @ W
            return (rng.standard_normal(shape) /
                    np.sqrt(fan_in)).astype(dtype)
        if len(shape) <= 1:
            return np.ones(shape, dtype) if name == "weight" \
                else np.zeros(shape, dtype)
        return (rng.standard_normal(shape) * 0.02).astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def host_device():
    """The host CPU device if the CPU backend is registered, else the
    default device. Used for fast host-side `model.init` (avoids hundreds
    of small round-trips through the TPU tunnel)."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


def runtime_overrides() -> dict:
    """Optional runtime config from the FREQFUSION_CONFIG yaml.

    The inference CLIs (test.py → io.main) and the feature extractor
    hardcode the shipped full-size MODEL_CONFIG like the reference
    (io.py:40-58); this hook is the debug-shrink analog of the reference's
    `--debug` mode (train.py:1219-1224) — a yaml with any of:

        model:  {fusion_dim, num_heads, refine_depth, refine_channels,
                 enable_* flags, expert_kwargs: {hat_kwargs: {...}, ...}}
        infer:  {tile, overlap, tile_batch}
    """
    path = os.environ.get("FREQFUSION_CONFIG")
    if not path or not os.path.exists(path):
        return {}
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}
