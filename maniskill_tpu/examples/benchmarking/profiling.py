"""Profiler (counterpart of mani_skill/examples/benchmarking/profiling.py:23-133).

Measures wall-time per N steps -> fps and per-step-per-env fps, host RSS, and
device memory; appends CSV rows keyed by config for benchmark tables
(CSV-compatible with the reference's format so numbers can sit side by side).
"""
from __future__ import annotations

import contextlib
import csv
import os
import time
from typing import Dict, Optional


def _host_rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _device_mem_mb() -> float:
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1e6
    except Exception:
        pass
    return 0.0


class Profiler:
    def __init__(self, output_format: str = "stdout", synchronize_fn=None):
        self.output_format = output_format
        self.stats: Dict[str, dict] = {}
        self.synchronize_fn = synchronize_fn

    def log(self, msg: str):
        print(msg, flush=True)

    @contextlib.contextmanager
    def profile(self, name: str, total_steps: int, num_envs: int):
        if self.synchronize_fn:
            self.synchronize_fn()
        start = time.perf_counter()
        rss0 = _host_rss_mb()
        yield
        if self.synchronize_fn:
            self.synchronize_fn()
        dt = time.perf_counter() - start
        self.stats[name] = dict(
            fps=total_steps * num_envs / dt,
            psps=total_steps / dt,  # parallel steps per second
            total_steps=total_steps,
            num_envs=num_envs,
            dt=dt,
            cpu_mem_mb=_host_rss_mb(),
            gpu_mem_mb=_device_mem_mb(),
        )

    def log_stats(self, name: str):
        s = self.stats[name]
        self.log(
            f"{name}: {s['fps']:,.1f} steps/s, {s['psps']:,.1f} parallel steps/s "
            f"({s['num_envs']} envs x {s['total_steps']} steps in {s['dt']:.2f}s), "
            f"host {s['cpu_mem_mb']:.0f}MB device {s['gpu_mem_mb']:.0f}MB"
        )

    @contextlib.contextmanager
    def xprof_trace(self, logdir: str):
        """Capture an XLA/TPU profile (view with xprof/tensorboard) — the
        TPU-native upgrade over the reference's pynvml sampling."""
        import jax

        with jax.profiler.trace(logdir):
            yield
        self.log(f"xprof trace written to {logdir}")

    def update_csv(self, csv_path: str, config: Dict):
        """Append/replace a row keyed by config columns (profiling.py:53-90)."""
        rows = []
        fieldnames = list(config.keys())
        for name, s in self.stats.items():
            fieldnames += [f"{name}/fps", f"{name}/psps"]
        fieldnames += ["cpu_mem_mb", "gpu_mem_mb"]
        fieldnames = list(dict.fromkeys(fieldnames))

        existing = []
        if os.path.exists(csv_path):
            with open(csv_path) as f:
                existing = list(csv.DictReader(f))

        row = dict(config)
        mem = dict(cpu_mem_mb=0.0, gpu_mem_mb=0.0)
        for name, s in self.stats.items():
            row[f"{name}/fps"] = round(s["fps"], 2)
            row[f"{name}/psps"] = round(s["psps"], 2)
            mem["cpu_mem_mb"] = max(mem["cpu_mem_mb"], s["cpu_mem_mb"])
            mem["gpu_mem_mb"] = max(mem["gpu_mem_mb"], s["gpu_mem_mb"])
        row.update({k: round(v, 1) for k, v in mem.items()})

        key = {k: str(v) for k, v in config.items()}
        out = [
            r for r in existing
            if {k: r.get(k, "") for k in key} != key
        ]
        out.append({k: str(v) for k, v in row.items()})
        for r in out:
            for k in r:
                if k not in fieldnames:
                    fieldnames.append(k)
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(out)
