"""Metric registry and reporting.

Capability parity with the reference
``metrics/metric_main_mi_multimodal.py:29-94``: ``@register_metric``
functions, ``calc_metric`` (validates, times, runs), per-modality
``mode_dict`` support, and ``report_metric`` appending
``metric-<mode>-<metric>.jsonl`` records.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

from .metric_utils import MetricOptions

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    assert callable(fn)
    _metric_dict[fn.__name__] = fn
    return fn


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict


def list_valid_metrics():
    return list(_metric_dict)


def calc_metric(metric: str, opts: MetricOptions, mode_name: Optional[str] = None) -> dict:
    assert is_valid_metric(metric), f"unknown metric {metric}; valid: {list_valid_metrics()}"
    start = time.time()
    results = _metric_dict[metric](opts)
    total_time = time.time() - start
    return dict(
        results=results,
        metric=metric,
        mode=mode_name,
        total_time=total_time,
        total_time_str=f"{total_time:.1f}s",
    )


def report_metric(result_dict: dict, run_dir: Optional[str] = None,
                  snapshot_path: Optional[str] = None,
                  kimg: Optional[int] = None) -> None:
    """Append to ``metric-<mode>-<metric>.jsonl`` (reference ``:70-85``).

    ``kimg`` stamps the row with the snapshot's training progress — under
    ``--metric-async`` the row is written at completion time, so the
    timestamp alone would misattribute the curve point."""
    metric = result_dict["metric"]
    mode = result_dict.get("mode")
    record = dict(result_dict, snapshot_path=snapshot_path, timestamp=time.time())
    if kimg is not None:
        record["kimg"] = int(kimg)
    print(json.dumps(record))
    if run_dir is not None and os.path.isdir(run_dir):
        name = f"metric-{mode}-{metric}.jsonl" if mode else f"metric-{metric}.jsonl"
        with open(os.path.join(run_dir, name), "at") as f:
            f.write(json.dumps(record) + "\n")


# ------------------------------------------------------------- metrics
# Registered configurations mirror the reference's
# (``metric_main_mi_multimodal.py:91-158``).

@register_metric
def fid50k_full(opts: MetricOptions) -> dict:
    from .fid import compute_fid

    value = compute_fid(opts, max_real=None, num_gen=50000)
    return {"fid50k_full": value}


@register_metric
def fid10k(opts: MetricOptions) -> dict:
    from .fid import compute_fid

    value = compute_fid(opts, max_real=10000, num_gen=10000)
    return {"fid10k": value}


@register_metric
def fid1k(opts: MetricOptions) -> dict:
    from .fid import compute_fid

    value = compute_fid(opts, max_real=1000, num_gen=1000)
    return {"fid1k": value}


@register_metric
def kid50k_full(opts: MetricOptions) -> dict:
    from .kid import compute_kid

    value = compute_kid(opts, max_real=1000000, num_gen=50000)
    return {"kid50k_full": value}


@register_metric
def kid10k(opts: MetricOptions) -> dict:
    from .kid import compute_kid

    value = compute_kid(opts, max_real=10000, num_gen=10000)
    return {"kid10k": value}


@register_metric
def pr50k3_full(opts: MetricOptions) -> dict:
    from .precision_recall import compute_pr

    precision, recall = compute_pr(opts, max_real=200000, num_gen=50000, nhood_size=3)
    return {"pr50k3_full_precision": precision, "pr50k3_full_recall": recall}


@register_metric
def pr10k3(opts: MetricOptions) -> dict:
    from .precision_recall import compute_pr

    precision, recall = compute_pr(opts, max_real=10000, num_gen=10000, nhood_size=3)
    return {"pr10k3_precision": precision, "pr10k3_recall": recall}


@register_metric
def is50k(opts: MetricOptions) -> dict:
    from .inception_score import compute_is

    mean, std = compute_is(opts, num_gen=50000, num_splits=10)
    return {"is50k_mean": mean, "is50k_std": std}


@register_metric
def ppl2_wend(opts: MetricOptions) -> dict:
    from .ppl import compute_ppl

    value = compute_ppl(opts, num_samples=50000, epsilon=1e-4, space="w", sampling="end")
    return {"ppl2_wend": value}


# StyleGAN3-only equivariance metrics; require a transform-capable
# generator on opts (``opts.generator_with_transform``), see
# tools/calc_metrics.
@register_metric
def eqt50k_int(opts: MetricOptions) -> dict:
    from .equivariance import compute_equivariance_metrics

    r = compute_equivariance_metrics(
        opts, num_samples=50000, compute_eqt_int=True,
        compute_eqt_frac=False, compute_eqr=False,
    )
    return {"eqt50k_int": r["eqt_int"]}


@register_metric
def eqt50k_frac(opts: MetricOptions) -> dict:
    from .equivariance import compute_equivariance_metrics

    r = compute_equivariance_metrics(
        opts, num_samples=50000, compute_eqt_int=False,
        compute_eqt_frac=True, compute_eqr=False,
    )
    return {"eqt50k_frac": r["eqt_frac"]}


@register_metric
def eqr50k(opts: MetricOptions) -> dict:
    from .equivariance import compute_equivariance_metrics

    r = compute_equivariance_metrics(
        opts, num_samples=50000, compute_eqt_int=False,
        compute_eqt_frac=False, compute_eqr=True,
    )
    return {"eqr50k": r["eqr"]}


@register_metric
def eqt1k_int(opts: MetricOptions) -> dict:
    """Fast tier of eqt50k_int (validation runs; same estimator)."""
    from .equivariance import compute_equivariance_metrics

    r = compute_equivariance_metrics(
        opts, num_samples=1000, compute_eqt_int=True,
        compute_eqt_frac=False, compute_eqr=False,
    )
    return {"eqt1k_int": r["eqt_int"]}


@register_metric
def eqr1k(opts: MetricOptions) -> dict:
    """Fast tier of eqr50k (validation runs; same estimator)."""
    from .equivariance import compute_equivariance_metrics

    r = compute_equivariance_metrics(
        opts, num_samples=1000, compute_eqt_int=False,
        compute_eqt_frac=False, compute_eqr=True,
    )
    return {"eqr1k": r["eqr"]}
