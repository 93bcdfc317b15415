"""Batch-parallel proving (the data-parallel axis, SURVEY.md S2b N10).

Each proof has an independent Fiat-Shamir transcript, so proofs cannot share
challenges - but all device work (vector commitments, IPP L/R MSMs,
generator folds) is independent across proofs and batches cleanly.

v1 (this module): sequential proof loop over a SHARED backend - generator
device arrays upload once, every Pallas kernel stays warm, so marginal
proofs skip all compile/upload cost.  Per-proof device utilisation already
amortises the dominant one-time costs.

v2 (staged fusion, designed, tracked for the next round): drive B provers
stage-synchronously and pack each stage's B MSMs / folds into single
block-aligned dispatches (the `_msm_pair` lane-packing in
``ops.pallas_backend`` generalises to B groups verbatim), then shard the
batch axis over the device mesh (``parallel.mesh``).  This is how the
4096-proof multi-host configuration in BASELINE.json is reached.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..core.prover import Prover
from ..core.verifier import Verifier
from ..core.transcript import Transcript
from ..core.pedersen import PedersenGens, BulletproofGens
from ..core.proof import R1CSProof


@dataclass
class BatchResult:
    proofs: list[R1CSProof]
    commitments: list[list[bytes]]


def prove_batch(
    pc_gens: PedersenGens,
    bp_gens: BulletproofGens,
    transcript_label: bytes,
    witnesses: list,
    build_circuit: Callable,
    backend=None,
    rng=None,
) -> BatchResult:
    """Prove the same circuit over a batch of witnesses.

    ``build_circuit(prover_or_verifier, witness_or_None) -> list[bytes]``
    must commit its inputs and synthesize constraints, returning the
    commitment list (prover side) or re-binding them (verifier side).
    """
    proofs = []
    commitments = []
    for w in witnesses:
        prover = Prover(pc_gens, Transcript(transcript_label), rng=rng)
        comms = build_circuit(prover, w)
        proofs.append(prover.prove(bp_gens, backend=backend))
        commitments.append(comms)
    return BatchResult(proofs, commitments)


def verify_batch(
    pc_gens: PedersenGens,
    bp_gens: BulletproofGens,
    transcript_label: bytes,
    result: BatchResult,
    build_circuit: Callable,
    backend=None,
) -> None:
    """Verify a batch (raises VerificationError on the first failure)."""
    for proof, comms in zip(result.proofs, result.commitments):
        verifier = Verifier(Transcript(transcript_label))
        build_circuit(verifier, comms)
        verifier.verify(proof, pc_gens, bp_gens, backend=backend)
