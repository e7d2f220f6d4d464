"""Capture diffusers FlowMatchEulerDiscreteScheduler outputs.

Mirrors the reference's scripts/capture_scheduler_parity.py (consumed by
tests/verify_scheduler_parity.rs): sigma/timestep schedules for the basic,
dynamic-shift, and terminal-stretch configurations, plus Euler step outputs.

Emits fixtures/scheduler_diffusers.safetensors, consumed by
tests/test_diffusers_fixtures.py::test_scheduler_diffusers_parity.
Skips cleanly when diffusers is absent.
"""

from __future__ import annotations

import numpy as np

from capture_common import require_diffusers, save

require_diffusers("capture_scheduler_parity")

import torch  # noqa: E402
from diffusers import FlowMatchEulerDiscreteScheduler  # noqa: E402


def main():
    out = {}

    # --- basic: static shift, no terminal stretch -------------------------
    sch = FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, shift=1.0, use_dynamic_shifting=False
    )
    for n in (10, 20, 40):
        sch.set_timesteps(n, device="cpu")
        out[f"basic_timesteps_{n}"] = sch.timesteps.float().numpy()
        out[f"basic_sigmas_{n}"] = sch.sigmas.float().numpy()

    # --- dynamic shifting (SD3 mu) ----------------------------------------
    sch = FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, use_dynamic_shifting=True,
        base_shift=0.95, max_shift=2.05,
        base_image_seq_len=1024, max_image_seq_len=4096,
    )
    for mu in (0.5, 1.0, 1.5):
        for n in (10, 40):
            sch.set_timesteps(n, device="cpu", mu=mu)
            tag = f"mu{mu}_{n}"
            out[f"dyn_timesteps_{tag}"] = sch.timesteps.float().numpy()
            out[f"dyn_sigmas_{tag}"] = sch.sigmas.float().numpy()

    # --- terminal stretch (LTX: shift_terminal=0.1) ------------------------
    sch = FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, use_dynamic_shifting=True,
        base_shift=0.95, max_shift=2.05,
        base_image_seq_len=1024, max_image_seq_len=4096,
        shift_terminal=0.1,
    )
    for mu in (0.7, 1.2):
        for n in (7, 30):
            sch.set_timesteps(n, device="cpu", mu=mu)
            tag = f"mu{mu}_{n}"
            out[f"term_timesteps_{tag}"] = sch.timesteps.float().numpy()
            out[f"term_sigmas_{tag}"] = sch.sigmas.float().numpy()

    # --- Euler step outputs -------------------------------------------------
    sch = FlowMatchEulerDiscreteScheduler(
        num_train_timesteps=1000, use_dynamic_shifting=True,
        base_shift=0.95, max_shift=2.05,
        base_image_seq_len=1024, max_image_seq_len=4096,
        shift_terminal=0.1,
    )
    sch.set_timesteps(8, device="cpu", mu=1.0)
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.normal(size=(1, 64, 8)).astype(np.float32))
    out["step_sigmas"] = sch.sigmas.float().numpy()
    out["step_timesteps"] = sch.timesteps.float().numpy()
    out["step_x0"] = x.numpy().copy()
    for i, t in enumerate(sch.timesteps):
        v = torch.from_numpy(rng.normal(size=x.shape).astype(np.float32))
        out[f"step_v_{i}"] = v.numpy().copy()
        x = sch.step(v, t, x).prev_sample
        out[f"step_x_{i + 1}"] = x.float().numpy().copy()

    # --- scale_noise (forward process) --------------------------------------
    sch.set_timesteps(8, device="cpu", mu=1.0)
    sample = torch.from_numpy(rng.normal(size=(1, 32, 4)).astype(np.float32))
    noise = torch.from_numpy(rng.normal(size=(1, 32, 4)).astype(np.float32))
    t = sch.timesteps[2:3]
    out["scale_noise_sample"] = sample.numpy().copy()
    out["scale_noise_noise"] = noise.numpy().copy()
    out["scale_noise_t"] = t.float().numpy()
    out["scale_noise_out"] = sch.scale_noise(sample, t, noise).float().numpy()

    save("scheduler_diffusers.safetensors", out)


if __name__ == "__main__":
    main()
