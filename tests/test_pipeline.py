"""End-to-end pipeline plumbing on simulated data.

Uses an oracle engine (posterior = center-row allele frequencies) so the
test isolates the data path — candidates, tensors, alt_info, VCF assembly —
from network weights (covered by test_model_parity).
"""

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.genome.chunks import Chunk, plan_chunks
from clairs_to_tpu.genome.fasta import FastaFile
from clairs_to_tpu.infer.engine import BatchResult, recover_strand_counts
from clairs_to_tpu.infer.pipeline import CallingPipeline, PipelineOptions
from clairs_to_tpu.vcf.writer import VcfWriter
from clairs_to_tpu.vcf.sort import merge_vcf_files


class OracleEngine:
    """Posterior from observed AFs at the window center: alleles with AF above
    threshold get posterior ~1. Exposes the InferenceEngine.run_batch API."""

    def __init__(self, mode="snv", af_threshold=0.05):
        self.mode = mode
        self.n_alleles = 4 if mode == "snv" else 6
        self.af_threshold = af_threshold

    def run_batch(self, x_aff, x_neg, cov_aff, cov_neg):
        n = x_aff.shape[0]
        center = x_aff[:, cfg.FLANKING_BASE_NUM, :]
        fwd, rev = recover_strand_counts(center)
        acgt = fwd + rev
        post = np.zeros((n, self.n_alleles))
        for i in range(n):
            total = max(cov_aff[i], 1)
            # the ref channel is negative-encoded in the raw tensor
            if (center[i, 0:4] < 0).any():
                ref_idx = int(np.argmin(center[i, 0:4]))
            else:
                ref_idx = int(np.argmax(acgt[i]))
            for k in range(4):
                af = acgt[i, k] / total
                if k != ref_idx and af >= self.af_threshold:
                    post[i, k] = min(0.5 + af, 0.99)
            if post[i].max() == 0:
                post[i, ref_idx] = 0.95
        return BatchResult(
            p_aff=post[:, :4].astype(np.float32),
            p_neg=(1 - post[:, :4]).astype(np.float32),
            posterior=post,
            forward_acgt=fwd,
            reverse_acgt=rev,
        )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("sim")
    return simulate.make_dataset(
        str(out), seed=11, genome_len=40_000, coverage=55, n_snv=12, n_germline=6
    )


def test_pipeline_calls_expected_variants(dataset, tmp_path):
    fasta = FastaFile(dataset["fasta"])
    pipe = CallingPipeline(
        fasta,
        dataset["bam"],
        snv_engine=OracleEngine(),
        options=PipelineOptions(platform="ont", qual_cutoff=0),
    )
    chunks = plan_chunks(fasta, chunk_size=15_000)
    assert len(chunks) == 3
    all_rows = []
    for ch in chunks:
        res = pipe.call_chunk(ch)
        all_rows.extend(res.snv_rows)

    called = {(r["CHROM"], r["POS"]) for r in all_rows}
    somatic = {
        (dataset["ctg"], v.pos + 1)
        for v in dataset["variants"]
        if v.kind == "snv" and not v.germline
    }
    germline = {
        (dataset["ctg"], v.pos + 1) for v in dataset["variants"] if v.germline
    }
    # the oracle calls any site with an alt AF>=8%: somatic + germline
    missed = somatic - called
    assert len(missed) <= 1, f"missed {missed}"
    assert len(germline - called) == 0
    extra = called - somatic - germline
    assert len(extra) <= 3, f"unexpected calls {extra}"

    # REF/ALT must match the spiked variants
    by_pos = {r["POS"]: r for r in all_rows}
    for v in dataset["variants"]:
        if v.germline or v.kind != "snv":
            continue
        row = by_pos.get(v.pos + 1)
        if row is None:
            continue
        assert row["REF"] == v.ref and row["ALT"] == v.alt, (v.pos, row)
        assert row["FILTER"] == "PASS"
        # AF should approximate the spiked AF (binomial noise at ~50x)
        assert row["AF"] == pytest.approx(v.af, abs=0.2)


def test_pipeline_chunk_boundary_consistency(dataset):
    """A variant must be called exactly once regardless of chunk size."""
    fasta = FastaFile(dataset["fasta"])
    pipe = CallingPipeline(
        fasta, dataset["bam"], snv_engine=OracleEngine(),
        options=PipelineOptions(platform="ont"),
    )
    rows_a, rows_b = [], []
    for ch in plan_chunks(fasta, chunk_size=40_000):
        rows_a.extend(pipe.call_chunk(ch).snv_rows)
    for ch in plan_chunks(fasta, chunk_size=7_000):
        rows_b.extend(pipe.call_chunk(ch).snv_rows)
    pos_a = sorted(r["POS"] for r in rows_a)
    pos_b = sorted(r["POS"] for r in rows_b)
    assert pos_a == pos_b


def test_pipeline_vcf_output_and_merge(dataset, tmp_path):
    fasta = FastaFile(dataset["fasta"])
    pipe = CallingPipeline(
        fasta, dataset["bam"], snv_engine=OracleEngine(),
        options=PipelineOptions(platform="ont"),
    )
    paths = []
    for ch in plan_chunks(fasta, chunk_size=15_000):
        res = pipe.call_chunk(ch)
        p = str(tmp_path / f"p_{ch.chunk_id}.vcf")
        w = VcfWriter(p, ctg_name=dataset["ctg"], ref_fn=dataset["fasta"])
        for row in res.snv_rows:
            w.write_row(**row)
        w.close()
        paths.append(p)
    merged = str(tmp_path / "snv.vcf")
    n = merge_vcf_files(paths, merged)
    assert n > 0
    lines = [l for l in open(merged) if not l.startswith("#")]
    assert len(lines) == n
    positions = [int(l.split("\t")[1]) for l in lines]
    assert positions == sorted(positions)
    # header present exactly once
    header_lines = [l for l in open(merged) if l.startswith("##fileformat")]
    assert len(header_lines) == 1
