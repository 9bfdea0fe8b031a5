"""Config defaults must match the reference CLI's defaults (Mando.py
argparse) so a default `mando-tpu` run equals a default `Mando.py` run."""

import pytest

import oracle
from mandalorion_tpu.config import PipelineConfig

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference tree not mounted")


def _reference_defaults():
    import io
    import os
    import sys
    import types

    # extract Mando.py's parser defaults without running the pipeline
    path = os.path.join(oracle.REFERENCE, "Mando.py")
    lines = open(path).readlines()
    kept = []
    for line in lines:
        if line.startswith("if len(sys.argv) == 1:"):
            break
        kept.append(line)
    mod = types.ModuleType("ref_mando_args")
    mod.__dict__["__file__"] = path
    oracle._install_mappy_stub()
    exec(compile("".join(kept), path, "exec"), mod.__dict__)
    return {a.dest: a.default for a in mod.parser._actions}


def test_defaults_match_reference():
    ref = _reference_defaults()
    cfg = PipelineConfig()
    assert cfg.upstream_buffer == int(ref["upstream_buffer"])
    assert cfg.downstream_buffer == int(ref["downstream_buffer"])
    assert cfg.minimum_ratio == float(ref["minimum_ratio"])
    assert cfg.minimum_internal_ratio == float(
        ref["minimum_internal_ratio"])
    assert cfg.minimum_reads == int(ref["minimum_reads"])
    assert cfg.overhangs == tuple(
        int(x) for x in ref["overhangs"].split(","))
    assert cfg.threads == int(ref["minimap2_threads"])
    assert cfg.minimum_isoform_length == int(
        ref["minimum_isoform_length"])
    assert cfg.minimum_feature_count == int(ref["minimum_feature_count"])
    assert cfg.splice_site_window == int(ref["splice_site_window"])
    assert cfg.acutoff == float(ref["Acutoff"])
    assert ",".join(cfg.white_list_polyA) == ref["white_list_polyA"]
    assert cfg.multi_exon_only == bool(int(ref["multi_exon_only"]))
    assert ",".join(cfg.junctions) == ref["junctions"]
    assert cfg.modules == ref["Modules"]
