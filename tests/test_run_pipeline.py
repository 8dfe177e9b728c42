# encoding=utf-8
"""End-to-end run_pipeline: output layout, error channel, resume."""

import json
import os

from kgx.config import PipelineConfig
from kgx.pages import synthetic_pages
from kgx.pipeline import run_pipeline


class TestRunPipeline:
    def test_layout_errors_and_resume(self, ray_session, tmp_path):
        out = str(tmp_path / "run")
        cfg = PipelineConfig(include_altlabels=True)
        s1 = run_pipeline(synthetic_pages(120), out, cfg, fingerprint="f1")
        assert s1["triples"] > 0
        assert s1["errors"] == 3  # pages 0, 50, 100 embed invalid records
        assert os.path.isfile(os.path.join(out, "graph", "_MANIFEST.json"))
        assert os.path.isfile(os.path.join(out, "_RUN.json"))
        with open(os.path.join(out, "_RUN.json")) as fp:
            assert json.load(fp)["triples"] == s1["triples"]

        # resume: same fingerprint → graph write skipped
        s2 = run_pipeline(synthetic_pages(120), out, cfg, fingerprint="f1")
        assert s2["resumed_skip"] is True
        assert s2["triples"] == s1["triples"]

    def test_checkpointed_stream(self, ray_session, tmp_path):
        out = str(tmp_path / "run2")
        s = run_pipeline(synthetic_pages(60), out, PipelineConfig(),
                         fingerprint="f2", checkpoint_triples=True)
        assert s["triples"] > 0
