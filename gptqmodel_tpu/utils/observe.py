"""Quantization observability: per-module stat rows + streaming CSV + HBM.

Analog of the reference's live stat table (looper/gptq_processor.py:349-361
``stat = {PROCESS_LOG_LAYER, ..., QUANT_LOG_LOSS, QUANT_LOG_DAMP,
PROCESS_LOG_TIME, PROCESS_USED_MEMORY}`` rendered row-by-row with
loss-threshold coloring, and loop_processor.py:594-660 region-timer
flushes): a multi-hour quant must narrate itself as it goes, and the CSV
must exist mid-run, not only at save time.

- one log line per quantized module: layer progress, module, colored loss,
  damp, samples, solve ms, pack ms, device HBM in use;
- every row is appended (and flushed) to a CSV immediately;
- ``RegionTimer`` accumulates named spans and prints a summary table.
"""

from __future__ import annotations

import csv
import logging
import os
import sys
import time
from pathlib import Path

log = logging.getLogger("gptqmodel_tpu")

# loss coloring thresholds (reference colors the loss cell green/yellow/red
# against the method's expected-loss band)
_GREEN, _YELLOW, _RED, _DIM, _RESET = (
    "\033[32m", "\033[33m", "\033[31m", "\033[2m", "\033[0m",
)


def _color(loss: float, warn: float, bad: float, enable: bool) -> str:
    txt = f"{loss:.6f}"
    if not enable:
        return txt
    c = _GREEN if loss < warn else (_YELLOW if loss < bad else _RED)
    return f"{c}{txt}{_RESET}"


def device_hbm_in_use() -> str:
    """Live device memory (reference PROCESS_USED_MEMORY analog) — empty on
    platforms without memory_stats (CPU)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return ""
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        if limit:
            return f"{used/2**30:.2f}/{limit/2**30:.1f}GB"
        return f"{used/2**30:.2f}GB"
    except Exception:
        return ""


class QuantReporter:
    """Streams per-module quant stats: one log line + one CSV row each.

    ``csv_path`` default: $GPTQ_TPU_QUANT_LOG, else ``quant_log.stream.csv``
    in the cwd. The writer's final ``quant_log.csv`` (models/writer.py) stays
    the canonical artifact; this one exists DURING the run.
    """

    def __init__(
        self,
        csv_path: str | os.PathLike | None = None,
        total_layers: int = 0,
        loss_warn: float = 0.1,
        loss_bad: float = 1.0,
    ):
        self.csv_path = Path(
            csv_path
            or os.environ.get("GPTQ_TPU_QUANT_LOG", "quant_log.stream.csv")
        )
        self.total_layers = total_layers
        self.loss_warn = loss_warn
        self.loss_bad = loss_bad
        self._csv_file = None
        self._csv = None
        self._t0 = time.perf_counter()
        self._rows = 0
        self._color = sys.stderr.isatty()

    def _ensure_csv(self, fieldnames):
        if self._csv is None:
            try:
                self._csv_file = open(self.csv_path, "w", newline="")
                self._csv = csv.DictWriter(self._csv_file, fieldnames=fieldnames)
                self._csv.writeheader()
            except OSError as e:  # unwritable cwd: log-only mode
                log.warning("quant stream CSV disabled (%s)", e)
                self._csv = False

    def row(self, stat: dict, pack_s: float | None = None):
        """Log + stream one per-module stat row (call right after solve)."""
        self._rows += 1
        rec = dict(stat)
        rec["hbm"] = device_hbm_in_use()
        rec["wall_s"] = round(time.perf_counter() - self._t0, 1)
        if pack_s is not None:
            rec["pack_s"] = round(pack_s, 4)

        self._ensure_csv(list(rec.keys()))
        if self._csv:
            try:
                self._csv.writerow({k: rec.get(k, "") for k in self._csv.fieldnames})
                self._csv_file.flush()
            except (OSError, ValueError):
                pass

        layer = stat.get("layer", -1)
        prog = (
            f"[{layer + 1:>3}/{self.total_layers}]"
            if self.total_layers and layer >= 0
            else f"[{layer}]"
        )
        loss = stat.get("loss")
        loss_txt = (
            _color(float(loss), self.loss_warn, self.loss_bad, self._color)
            if loss is not None
            else "-"
        )
        fb = " FALLBACK" if stat.get("fallback") else ""
        hbm = f" hbm={rec['hbm']}" if rec["hbm"] else ""
        log.info(
            "%s %-28s loss=%s damp=%s n=%s solve=%.0fms%s%s",
            prog,
            stat.get("module", "?"),
            loss_txt,
            stat.get("damp", "-"),
            stat.get("samples", "-"),
            1e3 * float(stat.get("time_s", 0.0)),
            hbm,
            fb,
        )

    def layer_done(self, layer_idx: int, durations: dict):
        log.info(
            "layer %d/%s done  (fwd %.1fs solve %.1fs pack %.1fs, %d modules, %s)",
            layer_idx + 1,
            self.total_layers or "?",
            durations.get("forward", 0.0),
            durations.get("solve", 0.0),
            durations.get("pack", 0.0),
            self._rows,
            f"wall {time.perf_counter() - self._t0:.0f}s",
        )

    def close(self):
        if self._csv_file:
            try:
                self._csv_file.close()
            except OSError:
                pass
            self._csv_file = None
            self._csv = None


class RegionTimer:
    """Named-span accumulator (reference loop_processor region timers /
    logger region flushes): ``with timer("solve"): ...`` then ``summary()``."""

    def __init__(self):
        self.spans: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def __call__(self, name: str):
        return _Span(self, name)

    def add(self, name: str, dt: float):
        self.spans[name] = self.spans.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        total = sum(self.spans.values()) or 1.0
        lines = [
            f"  {k:<12} {v:8.2f}s {100*v/total:5.1f}%  x{self.counts[k]}"
            for k, v in sorted(self.spans.items(), key=lambda kv: -kv[1])
        ]
        return "region timers:\n" + "\n".join(lines)

    def log_summary(self):
        log.info("%s", self.summary())


class _Span:
    def __init__(self, timer: RegionTimer, name: str):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.timer.add(self.name, time.perf_counter() - self.t0)
        return False


class ReportingList(list):
    """quant_log list that narrates rows as they are appended — the loop's
    six append sites stay untouched; observability rides the data flow."""

    def __init__(self, reporter: QuantReporter | None = None):
        super().__init__()
        self.reporter = reporter

    def append(self, row):
        super().append(row)
        if self.reporter is not None:
            try:
                self.reporter.row(row)
            except Exception:  # observability must never kill a quant run
                log.debug("quant reporter row failed", exc_info=True)
