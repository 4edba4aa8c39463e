"""Dual-view (AFF/NEG) tensor parity with the reference's symlink semantics.

The reference generates the negational tensor with --min_bq 0; for min_bq=0
platforms both views coincide and it symlinks the NEG tensor dir to the AFF
one (run_clairs_to:1248-1252 for ilmn; hifi runs min_bq 0 in both passes,
shared/param.py:34).  The pipeline's analog is sharing one counts array —
this pins that it (a) shares, and (b) the shared view equals an
independently computed min_bq=0 view.
"""

import numpy as np
import pytest

from clairs_to_tpu import config as cfg
from clairs_to_tpu.bamio import simulate
from clairs_to_tpu.genome.chunks import Chunk
from clairs_to_tpu.genome.fasta import FastaFile
from clairs_to_tpu.infer.pipeline import CallingPipeline, PipelineOptions


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("dualview")
    return simulate.make_dataset(
        str(out), seed=13, genome_len=20_000, coverage=40, n_snv=8,
        n_germline=4, lowbq_rate=0.1,   # low-BQ bases: AFF/NEG views differ
    )


def _views(dataset, platform):
    fasta = FastaFile(dataset["fasta"])
    pipe = CallingPipeline(
        fasta, dataset["bam"], None,
        options=PipelineOptions(platform=platform),
    )
    chunk = Chunk("chrS", 0, 1, 0, fasta.contig_length("chrS"))
    pe, aff, neg, region_start, _ = pipe.build_chunk_views(chunk)
    return pe, aff, neg, region_start


@pytest.mark.parametrize("platform", ["ilmn", "hifi", "hifi_revio"])
def test_min_bq0_platforms_share_views(dataset, platform):
    assert cfg.MIN_BQ_DICT[platform] == 0  # guard: table matches reference
    pe, aff, neg, region_start = _views(dataset, platform)
    assert neg is aff  # the symlink analog: ONE decode, shared array

    # and the shared view IS the min_bq=0 view the reference would generate
    indep, _depth = pe.channel_counts(0, region_start,
                                      region_start + (aff.shape[0]))
    pe.apply_reference_encoding(indep, region_start)
    np.testing.assert_array_equal(np.asarray(aff), np.asarray(indep))


def test_ont_views_differ(dataset):
    assert cfg.MIN_BQ_DICT["ont"] == 20
    _pe, aff, neg, _ = _views(dataset, "ont")
    assert neg is not aff
    assert not np.array_equal(np.asarray(aff), np.asarray(neg))
