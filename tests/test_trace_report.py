"""trace_report: aggregation + host-event filtering on a synthetic trace."""

import gzip
import json
import os

from adaptive_tpu.utils.trace_report import device_op_summary, format_report, load_trace_events


def _fake_trace(tmp_path):
    events = [
        {"ph": "X", "name": "fusion.12", "dur": 1000},
        {"ph": "X", "name": "fusion.13", "dur": 2000},
        {"ph": "X", "name": "convolution.7", "dur": 4000},
        {"ph": "X", "name": "while.2", "dur": 500},
        {"ph": "X", "name": "$profiler.py:1 trace", "dur": 99999},  # host
        {"ph": "X", "name": "jit_step(123)", "dur": 99999},          # host
        {"ph": "M", "name": "fusion.9"},                              # no dur
    ]
    d = tmp_path / "plugins" / "profile" / "x"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_summary_and_filtering(tmp_path):
    events = load_trace_events(_fake_trace(tmp_path))
    summary = device_op_summary(events, iters=2)
    cats = {c: ms for c, ms, _ in summary}
    assert abs(cats["fusion"] - 1.5) < 1e-9  # (1000+2000)/2 us -> 1.5 ms
    assert abs(cats["convolution"] - 2.0) < 1e-9
    assert "while" in cats
    assert not any("$" in c or "jit" in c for c in cats)
    report = format_report(summary)
    assert "convolution" in report and "ms/iter" in report


def test_stage_split_classification(tmp_path):
    import gzip
    import json
    import os

    from adaptive_tpu.utils.trace_report import load_trace_events, stage_split

    events = [
        # decode ops by name
        {"ph": "X", "name": "while.6", "dur": 3000, "args": {"long_name": "%while.6 = (s32[]) while(...)"}},
        {"ph": "X", "name": "iota_reduce_fusion.2", "dur": 1000, "args": {"long_name": "%x = (bf16[512]) fusion(...)"}},
        # preprocess: OUTPUT shape carries 3 channels / raw 256x256 frame
        {"ph": "X", "name": "fusion.1", "dur": 500,
         "args": {"long_name": "%fusion.1 = bf16[512,224,224,3]{...} fusion(u8[512,256,256,3] %p)"}},
        # encoder: a 3x3 conv whose s8[3,3,256,256] WEIGHT operand must NOT
        # make it preprocess (the r2 misclassification)
        {"ph": "X", "name": "fusion.47", "dur": 2000,
         "args": {"long_name": "%fusion.47 = s32[512,14,14,1024]{...} fusion(s8[3,3,256,256] %w, s8[512,14,14,256] %a)"}},
    ]
    d = tmp_path / "plugins" / "profile" / "y"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    split = stage_split(load_trace_events(str(tmp_path)), iters=2)
    assert split == {"preprocess_ms": 0.25, "encoder_ms": 1.0, "decode_ms": 2.0}
