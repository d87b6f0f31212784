"""Spark: Spartan's sparse matrix polynomial commitment (computation
commitment), via offline memory checking.

Mirror of /root/reference/src/sparse_mlpoly.rs.  The three R1CS matrices
are represented jointly as dense "ops" polynomials (row addr, row read-ts,
col addr, col read-ts, val — merged into comb_ops; audit timestamps merged
into comb_mem), committed with row-wise Pedersen.  The evaluation proof is
the randomized offline-memory-checking argument: hashed (addr, val, ts)
multisets compared through grand-product trees (GKR) plus a hash-layer
opening of every polynomial at the GKR-derived points.

Transcript: Fr sponge throughout (this subprotocol is untouched by the
fork's Fq migration).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields.bls12_377 import R
from ..poly import dense
from ..tpu import field as jf
from ..tpu.field import FR
from . import polycommit
from . import product_tree as ptree
from .errors import ProofVerifyError


# ---------------------------------------------------------------------------
# Dense representation with address timestamps
# ---------------------------------------------------------------------------


@dataclass
class AddrTimestamps:
    ops_addr_usize: List[np.ndarray]
    ops_addr: List[jnp.ndarray]  # device tables
    read_ts: List[jnp.ndarray]
    audit_ts: jnp.ndarray

    @staticmethod
    def new(num_cells: int, num_ops: int, ops_addr: List[np.ndarray]) -> "AddrTimestamps":
        """Read-timestamp construction (sparse_mlpoly.rs:220-279), fully
        vectorized: the reference walks every op bumping a per-cell counter;
        the same counters fall out of a stable sort — read_ts of op i is
        its rank among equal addresses ACROSS the concatenated instances
        (the audit counter carries over from instance to instance), and
        audit_ts is the per-cell total."""
        all_addr = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in ops_addr]
        )
        total = all_addr.shape[0]
        assert total == num_ops * len(ops_addr)
        order = np.argsort(all_addr, kind="stable")
        sorted_addr = all_addr[order]
        is_start = np.empty(total, dtype=bool)
        if total:
            is_start[0] = True
            is_start[1:] = sorted_addr[1:] != sorted_addr[:-1]
        run_id = np.cumsum(is_start) - 1
        run_starts = np.flatnonzero(is_start)
        rank = np.arange(total, dtype=np.int64) - run_starts[run_id]
        read_all = np.empty(total, dtype=np.int64)
        read_all[order] = rank
        audit_np = np.bincount(all_addr, minlength=num_cells).astype(np.int64)
        assert audit_np.shape[0] == num_cells, "address out of range"
        addr_polys = [
            dense.encode_table_small(np.asarray(a, dtype=np.int64))
            for a in ops_addr
        ]
        read_polys = [
            dense.encode_table_small(read_all[k * num_ops : (k + 1) * num_ops])
            for k in range(len(ops_addr))
        ]
        return AddrTimestamps(
            ops_addr,
            addr_polys,
            read_polys,
            dense.encode_table_small(audit_np),
        )

    def deref(self, mem_val_dev: jnp.ndarray) -> List[jnp.ndarray]:
        """ops_val[i] = mem_val[addr[i]] — device gathers."""
        return [
            mem_val_dev[jnp.asarray(addr)] for addr in self.ops_addr_usize
        ]


@dataclass
class MultiSparseMatPolynomialAsDense:
    batch_size: int
    val: List[jnp.ndarray]
    row: AddrTimestamps
    col: AddrTimestamps
    comb_ops: jnp.ndarray
    comb_mem: jnp.ndarray


@dataclass
class SparseMatPolyCommitmentGens:
    gens_ops: polycommit.PolyCommitmentGens
    gens_mem: polycommit.PolyCommitmentGens
    gens_derefs: polycommit.PolyCommitmentGens

    @staticmethod
    def setup(label: bytes, num_vars_x: int, num_vars_y: int,
              num_nz_entries: int, batch_size: int) -> "SparseMatPolyCommitmentGens":
        def next_pow2_log(v):
            return max(1, (v - 1).bit_length()) if v > 1 else 0

        num_vars_ops = next_pow2_log(num_nz_entries) + next_pow2_log(batch_size * 5)
        num_vars_mem = max(num_vars_x, num_vars_y) + 1
        num_vars_derefs = next_pow2_log(num_nz_entries) + next_pow2_log(batch_size * 2)
        return SparseMatPolyCommitmentGens(
            polycommit.PolyCommitmentGens.setup(num_vars_ops, label),
            polycommit.PolyCommitmentGens.setup(num_vars_mem, label),
            polycommit.PolyCommitmentGens.setup(num_vars_derefs, label),
        )


@dataclass
class SparseMatPolyCommitment:
    batch_size: int
    num_ops: int
    num_mem_cells: int
    comm_comb_ops: polycommit.PolyCommitment
    comm_comb_mem: polycommit.PolyCommitment

    def write_to_transcript(self, transcript) -> None:
        transcript.append_u64(self.batch_size)
        transcript.append_u64(self.num_ops)
        transcript.append_u64(self.num_mem_cells)
        self.comm_comb_ops.write_to_transcript(transcript)
        self.comm_comb_mem.write_to_transcript(transcript)


def multi_sparse_to_dense_rep(sparse_polys) -> MultiSparseMatPolynomialAsDense:
    """sparse_mlpoly.rs:373-437."""
    assert sparse_polys
    N = max(max(1, p.nnz) for p in sparse_polys)
    N = 1 << max(0, (N - 1)).bit_length() if N > 1 else 1

    ops_row_vec, ops_col_vec, val_vec = [], [], []
    for p in sparse_polys:
        rows = np.zeros(N, dtype=np.int64)
        cols = np.zeros(N, dtype=np.int64)
        vals = [0] * N
        rows[: p.nnz] = p.rows
        cols[: p.nnz] = p.cols
        vals[: p.nnz] = list(p.vals)
        ops_row_vec.append(rows)
        ops_col_vec.append(cols)
        val_vec.append(dense.encode_table(vals))

    any_poly = sparse_polys[0]
    num_mem_cells = 1 << max(any_poly.num_vars_x, any_poly.num_vars_y)
    row = AddrTimestamps.new(num_mem_cells, N, ops_row_vec)
    col = AddrTimestamps.new(num_mem_cells, N, ops_col_vec)

    comb_ops = dense.merge_tables(
        row.ops_addr + row.read_ts + col.ops_addr + col.read_ts + val_vec
    )
    comb_mem = dense.merge_tables([row.audit_ts, col.audit_ts])
    return MultiSparseMatPolynomialAsDense(
        len(sparse_polys), val_vec, row, col, comb_ops, comb_mem
    )


def multi_commit(sparse_polys, gens: SparseMatPolyCommitmentGens):
    """sparse_mlpoly.rs:490-516."""
    dense_rep = multi_sparse_to_dense_rep(sparse_polys)
    comm_ops, _ = polycommit.commit(dense_rep.comb_ops, gens.gens_ops)
    comm_mem, _ = polycommit.commit(dense_rep.comb_mem, gens.gens_mem)
    return (
        SparseMatPolyCommitment(
            dense_rep.batch_size,
            dense_rep.row.read_ts[0].shape[0],
            dense_rep.row.audit_ts.shape[0],
            comm_ops,
            comm_mem,
        ),
        dense_rep,
    )


# ---------------------------------------------------------------------------
# Derefs
# ---------------------------------------------------------------------------


@dataclass
class Derefs:
    row_ops_val: List[jnp.ndarray]
    col_ops_val: List[jnp.ndarray]
    comb: jnp.ndarray

    @staticmethod
    def new(row_ops_val, col_ops_val) -> "Derefs":
        comb = dense.merge_tables(list(row_ops_val) + list(col_ops_val))
        return Derefs(row_ops_val, col_ops_val, comb)

    def commit(self, gens: polycommit.PolyCommitmentGens):
        comm, _ = polycommit.commit(self.comb, gens)
        return DerefsCommitment(comm)


@dataclass
class DerefsCommitment:
    comm_ops_val: polycommit.PolyCommitment

    def write_to_transcript(self, transcript) -> None:
        self.comm_ops_val.write_to_transcript(transcript)


@dataclass
class DerefsEvalProof:
    proof_derefs: polycommit.PolyEvalProof


def _bound_bot_chain(evals: List[int], challenges: List[int]) -> int:
    """Fold a small host eval list with bound_poly_var_bot, highest challenge
    first (sparse_mlpoly.rs:108-121)."""
    vals = [v % R for v in evals]
    for ch in reversed(challenges):
        vals = [
            (vals[2 * i] + ch * (vals[2 * i + 1] - vals[2 * i])) % R
            for i in range(len(vals) // 2)
        ]
    assert len(vals) == 1
    return vals[0]


def derefs_prove(derefs: Derefs, eval_row_vec, eval_col_vec, r, gens, transcript):
    """DerefsEvalProof::prove (sparse_mlpoly.rs:138-157)."""
    evals = list(eval_row_vec) + list(eval_col_vec)
    target = 1 << max(0, (len(evals) - 1)).bit_length()
    evals = evals + [0] * (target - len(evals))
    transcript.append_scalar_vector(evals, R)
    lg = len(evals).bit_length() - 1
    challenges = transcript.challenge_scalar_vec(R, lg)
    joint_eval = _bound_bot_chain(evals, challenges)
    r_joint = challenges + list(r)
    transcript.append_scalar(joint_eval, R)
    proof, _C = polycommit.prove(
        derefs.comb, None, r_joint, joint_eval, 0, gens, transcript
    )
    return DerefsEvalProof(proof)


def derefs_verify(proof: DerefsEvalProof, r, eval_row_vec, eval_col_vec,
                  gens, comm: DerefsCommitment, transcript) -> bool:
    evals = list(eval_row_vec) + list(eval_col_vec)
    target = 1 << max(0, (len(evals) - 1)).bit_length()
    evals = evals + [0] * (target - len(evals))
    transcript.append_scalar_vector(evals, R)
    lg = len(evals).bit_length() - 1
    challenges = transcript.challenge_scalar_vec(R, lg)
    joint_eval = _bound_bot_chain(evals, challenges)
    r_joint = challenges + list(r)
    transcript.append_scalar(joint_eval, R)
    return polycommit.verify_plain(
        proof.proof_derefs, gens, transcript, r_joint, joint_eval, comm.comm_ops_val
    )


# ---------------------------------------------------------------------------
# Hash layer + product layer
# ---------------------------------------------------------------------------


def _hash_tables(eval_table: jnp.ndarray, addrs: List[jnp.ndarray],
                 derefs: List[jnp.ndarray], read_ts: List[jnp.ndarray],
                 audit_ts: jnp.ndarray, r_hash: int, r_multiset: int):
    """build_hash_layer (sparse_mlpoly.rs:542-615): hash(addr, val, ts) =
    ts r^2 + val r + addr, minus the multiset challenge."""
    num_cells = eval_table.shape[0]
    rh = dense.encode_scalar(r_hash)
    rh2 = dense.encode_scalar(r_hash * r_hash % R)
    rm = dense.encode_scalar(r_multiset)
    idx = dense.encode_table(list(range(num_cells)))
    one = dense.encode_scalar(1)

    def hash_dev(addr, val, ts):
        return jf.sub(
            FR,
            jf.add(
                FR,
                jf.add(
                    FR,
                    jf.mont_mul(FR, ts, rh2),
                    jf.mont_mul(FR, val, rh),
                ),
                addr,
            ),
            rm,
        )

    zero_ts = jnp.zeros_like(eval_table)
    init = hash_dev(idx, eval_table, zero_ts)
    audit = hash_dev(idx, eval_table, audit_ts)
    reads, writes = [], []
    for a, d, t in zip(addrs, derefs, read_ts):
        reads.append(hash_dev(a, d, t))
        w_ts = jf.add(FR, t, jnp.broadcast_to(one, t.shape))
        writes.append(hash_dev(a, d, w_ts))
    return init, reads, writes, audit


@dataclass
class ProductLayer:
    init: ptree.ProductCircuit
    read_vec: List[ptree.ProductCircuit]
    write_vec: List[ptree.ProductCircuit]
    audit: ptree.ProductCircuit


def build_layers(eval_table: jnp.ndarray, addr_ts: AddrTimestamps,
                 poly_ops_val: List[jnp.ndarray], r_mem_check) -> ProductLayer:
    """Layers::new (sparse_mlpoly.rs:617-665)."""
    r_hash, r_multiset = r_mem_check
    init_h, reads_h, writes_h, audit_h = _hash_tables(
        eval_table, addr_ts.ops_addr, poly_ops_val, addr_ts.read_ts,
        addr_ts.audit_ts, r_hash, r_multiset,
    )
    return ProductLayer(
        ptree.ProductCircuit(init_h),
        [ptree.ProductCircuit(x) for x in reads_h],
        [ptree.ProductCircuit(x) for x in writes_h],
        ptree.ProductCircuit(audit_h),
    )


@dataclass
class ProductLayerProof:
    eval_row: Tuple[int, List[int], List[int], int]
    eval_col: Tuple[int, List[int], List[int], int]
    eval_val: Tuple[List[int], List[int]]
    proof_mem: ptree.ProductCircuitEvalProofBatched
    proof_ops: ptree.ProductCircuitEvalProofBatched


def product_layer_prove(row_layer: ProductLayer, col_layer: ProductLayer,
                        dense_rep: MultiSparseMatPolynomialAsDense,
                        derefs: Derefs, evals: List[int], transcript):
    """ProductLayerProof::prove (sparse_mlpoly.rs:1052-1236)."""
    row_eval_init = row_layer.init.evaluate()
    row_eval_audit = row_layer.audit.evaluate()
    row_eval_read = [c.evaluate() for c in row_layer.read_vec]
    row_eval_write = [c.evaluate() for c in row_layer.write_vec]
    ws = 1
    for v in row_eval_write:
        ws = ws * v % R
    rs = 1
    for v in row_eval_read:
        rs = rs * v % R
    assert row_eval_init * ws % R == rs * row_eval_audit % R

    transcript.append_scalar(row_eval_init, R)
    transcript.append_scalar_vector(row_eval_read, R)
    transcript.append_scalar_vector(row_eval_write, R)
    transcript.append_scalar(row_eval_audit, R)

    col_eval_init = col_layer.init.evaluate()
    col_eval_audit = col_layer.audit.evaluate()
    col_eval_read = [c.evaluate() for c in col_layer.read_vec]
    col_eval_write = [c.evaluate() for c in col_layer.write_vec]
    ws = 1
    for v in col_eval_write:
        ws = ws * v % R
    rs = 1
    for v in col_eval_read:
        rs = rs * v % R
    assert col_eval_init * ws % R == rs * col_eval_audit % R

    transcript.append_scalar(col_eval_init, R)
    transcript.append_scalar_vector(col_eval_read, R)
    transcript.append_scalar_vector(col_eval_write, R)
    transcript.append_scalar(col_eval_audit, R)

    # dot-product circuits proving the claimed evaluations
    dotp_left_vec, dotp_right_vec = [], []
    eval_dotp_left_vec, eval_dotp_right_vec = [], []
    for i in range(len(derefs.row_ops_val)):
        dotp = ptree.DotProductCircuit(
            derefs.row_ops_val[i], derefs.col_ops_val[i], dense_rep.val[i]
        )
        dl, dr = dotp.split()
        e_l, e_r = dl.evaluate(), dr.evaluate()
        transcript.append_scalar(e_l, R)
        transcript.append_scalar(e_r, R)
        assert (e_l + e_r) % R == evals[i] % R
        eval_dotp_left_vec.append(e_l)
        eval_dotp_right_vec.append(e_r)
        dotp_left_vec.append(dl)
        dotp_right_vec.append(dr)

    assert len(row_layer.read_vec) == 3, "batch size must be 3 (reference :1142)"
    prod_list = (
        row_layer.read_vec + row_layer.write_vec
        + col_layer.read_vec + col_layer.write_vec
    )
    dotp_list = [
        dotp_left_vec[0], dotp_right_vec[0],
        dotp_left_vec[1], dotp_right_vec[1],
        dotp_left_vec[2], dotp_right_vec[2],
    ]
    proof_ops, rand_ops = ptree.ProductCircuitEvalProofBatched.prove(
        prod_list, dotp_list, transcript
    )
    proof_mem, rand_mem = ptree.ProductCircuitEvalProofBatched.prove(
        [row_layer.init, row_layer.audit, col_layer.init, col_layer.audit],
        [],
        transcript,
    )
    return (
        ProductLayerProof(
            (row_eval_init, row_eval_read, row_eval_write, row_eval_audit),
            (col_eval_init, col_eval_read, col_eval_write, col_eval_audit),
            (eval_dotp_left_vec, eval_dotp_right_vec),
            proof_mem,
            proof_ops,
        ),
        rand_mem,
        rand_ops,
    )


def product_layer_verify(proof: ProductLayerProof, num_ops: int, num_cells: int,
                         evals: List[int], transcript):
    """ProductLayerProof::verify (sparse_mlpoly.rs:1238-1334)."""
    num_instances = len(evals)
    row_init, row_read, row_write, row_audit = proof.eval_row
    assert len(row_read) == num_instances
    ws = 1
    for v in row_write:
        ws = ws * v % R
    rs = 1
    for v in row_read:
        rs = rs * v % R
    assert ws * row_init % R == rs * row_audit % R
    transcript.append_scalar(row_init, R)
    transcript.append_scalar_vector(row_read, R)
    transcript.append_scalar_vector(row_write, R)
    transcript.append_scalar(row_audit, R)

    col_init, col_read, col_write, col_audit = proof.eval_col
    ws = 1
    for v in col_write:
        ws = ws * v % R
    rs = 1
    for v in col_read:
        rs = rs * v % R
    assert ws * col_init % R == rs * col_audit % R
    transcript.append_scalar(col_init, R)
    transcript.append_scalar_vector(col_read, R)
    transcript.append_scalar_vector(col_write, R)
    transcript.append_scalar(col_audit, R)

    dotp_left, dotp_right = proof.eval_val
    assert len(dotp_left) == num_instances
    claims_dotp_circuit = []
    for i in range(num_instances):
        assert (dotp_left[i] + dotp_right[i]) % R == evals[i] % R
        transcript.append_scalar(dotp_left[i], R)
        transcript.append_scalar(dotp_right[i], R)
        claims_dotp_circuit.extend([dotp_left[i], dotp_right[i]])

    claims_prod_circuit = list(row_read) + list(row_write) + list(col_read) + list(col_write)
    claims_ops, claims_dotp, rand_ops = proof.proof_ops.verify(
        claims_prod_circuit, claims_dotp_circuit, num_ops, transcript
    )
    claims_mem, _, rand_mem = proof.proof_mem.verify(
        [row_init, row_audit, col_init, col_audit], [], num_cells, transcript
    )
    return claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops


# ---------------------------------------------------------------------------
# Hash layer proof
# ---------------------------------------------------------------------------


@dataclass
class HashLayerProof:
    eval_row: Tuple[List[int], List[int], int]
    eval_col: Tuple[List[int], List[int], int]
    eval_val: List[int]
    eval_derefs: Tuple[List[int], List[int]]
    proof_ops: polycommit.PolyEvalProof
    proof_mem: polycommit.PolyEvalProof
    proof_derefs: DerefsEvalProof


def hash_layer_prove(rand, dense_rep: MultiSparseMatPolynomialAsDense,
                     derefs: Derefs, gens: SparseMatPolyCommitmentGens,
                     transcript) -> HashLayerProof:
    """HashLayerProof::prove (sparse_mlpoly.rs:733-837)."""
    rand_mem, rand_ops = rand

    eval_row_ops_val = [dense.evaluate(t, rand_ops) for t in derefs.row_ops_val]
    eval_col_ops_val = [dense.evaluate(t, rand_ops) for t in derefs.col_ops_val]
    proof_derefs = derefs_prove(
        derefs, eval_row_ops_val, eval_col_ops_val, rand_ops,
        gens.gens_derefs, transcript,
    )

    def helper(at: AddrTimestamps):
        addr = [dense.evaluate(t, rand_ops) for t in at.ops_addr]
        read = [dense.evaluate(t, rand_ops) for t in at.read_ts]
        audit = dense.evaluate(at.audit_ts, rand_mem)
        return addr, read, audit

    row_addr, row_read, row_audit = helper(dense_rep.row)
    col_addr, col_read, col_audit = helper(dense_rep.col)
    eval_val = [dense.evaluate(t, rand_ops) for t in dense_rep.val]

    evals_ops = row_addr + row_read + col_addr + col_read + eval_val
    target = 1 << max(0, (len(evals_ops) - 1)).bit_length()
    evals_ops = evals_ops + [0] * (target - len(evals_ops))
    transcript.append_scalar_vector(evals_ops, R)
    lg = len(evals_ops).bit_length() - 1
    challenges_ops = transcript.challenge_scalar_vec(R, lg)
    joint_ops = _bound_bot_chain(evals_ops, challenges_ops)
    r_joint_ops = challenges_ops + list(rand_ops)
    transcript.append_scalar(joint_ops, R)
    proof_ops, _ = polycommit.prove(
        dense_rep.comb_ops, None, r_joint_ops, joint_ops, 0,
        gens.gens_ops, transcript,
    )

    evals_mem = [row_audit, col_audit]
    transcript.append_scalar_vector(evals_mem, R)
    challenges_mem = transcript.challenge_scalar_vec(R, 1)
    joint_mem = _bound_bot_chain(evals_mem, challenges_mem)
    r_joint_mem = challenges_mem + list(rand_mem)
    transcript.append_scalar(joint_mem, R)
    proof_mem, _ = polycommit.prove(
        dense_rep.comb_mem, None, r_joint_mem, joint_mem, 0,
        gens.gens_mem, transcript,
    )

    return HashLayerProof(
        (row_addr, row_read, row_audit),
        (col_addr, col_read, col_audit),
        eval_val,
        (eval_row_ops_val, eval_col_ops_val),
        proof_ops,
        proof_mem,
        proof_derefs,
    )


def _hash_layer_verify_helper(rand_mem, claims, eval_ops_val, eval_ops_addr,
                              eval_read_ts, eval_audit_ts, r, r_hash,
                              r_multiset) -> bool:
    """verify_helper (sparse_mlpoly.rs:839-894)."""
    rh2 = r_hash * r_hash % R

    def hash_f(addr, val, ts):
        return (rh2 * ts + val * r_hash + addr) % R

    claim_init, claim_read, claim_write, claim_audit = claims
    eval_init_addr = dense.identity_evaluate(rand_mem)
    eval_init_val = dense.eq_evaluate(list(r), rand_mem)
    if (hash_f(eval_init_addr, eval_init_val, 0) - r_multiset) % R != claim_init % R:
        return False
    for i in range(len(eval_ops_addr)):
        if (hash_f(eval_ops_addr[i], eval_ops_val[i], eval_read_ts[i]) - r_multiset) % R != claim_read[i] % R:
            return False
        if (hash_f(eval_ops_addr[i], eval_ops_val[i], eval_read_ts[i] + 1) - r_multiset) % R != claim_write[i] % R:
            return False
    if (hash_f(eval_init_addr, eval_init_val, eval_audit_ts) - r_multiset) % R != claim_audit % R:
        return False
    return True


def hash_layer_verify(proof: HashLayerProof, rand, claims_row, claims_col,
                      claims_dotp, comm: SparseMatPolyCommitment,
                      gens: SparseMatPolyCommitmentGens,
                      comm_derefs: DerefsCommitment, rx, ry, r_hash,
                      r_multiset, transcript) -> bool:
    """HashLayerProof::verify (sparse_mlpoly.rs:896-1040)."""
    rand_mem, rand_ops = rand
    eval_row_ops_val, eval_col_ops_val = proof.eval_derefs
    if not derefs_verify(
        proof.proof_derefs, rand_ops, eval_row_ops_val, eval_col_ops_val,
        gens.gens_derefs, comm_derefs, transcript,
    ):
        return False

    eval_val_vec = proof.eval_val
    assert len(claims_dotp) == 3 * len(eval_row_ops_val)
    for i in range(len(claims_dotp) // 3):
        if (
            claims_dotp[3 * i] % R != eval_row_ops_val[i] % R
            or claims_dotp[3 * i + 1] % R != eval_col_ops_val[i] % R
            or claims_dotp[3 * i + 2] % R != eval_val_vec[i] % R
        ):
            return False

    row_addr, row_read, row_audit = proof.eval_row
    col_addr, col_read, col_audit = proof.eval_col
    evals_ops = list(row_addr) + list(row_read) + list(col_addr) + list(col_read) + list(eval_val_vec)
    target = 1 << max(0, (len(evals_ops) - 1)).bit_length()
    evals_ops = evals_ops + [0] * (target - len(evals_ops))
    transcript.append_scalar_vector(evals_ops, R)
    lg = len(evals_ops).bit_length() - 1
    challenges_ops = transcript.challenge_scalar_vec(R, lg)
    joint_ops = _bound_bot_chain(evals_ops, challenges_ops)
    r_joint_ops = challenges_ops + list(rand_ops)
    transcript.append_scalar(joint_ops, R)
    if not polycommit.verify_plain(
        proof.proof_ops, gens.gens_ops, transcript, r_joint_ops, joint_ops,
        comm.comm_comb_ops,
    ):
        return False

    evals_mem = [row_audit, col_audit]
    transcript.append_scalar_vector(evals_mem, R)
    challenges_mem = transcript.challenge_scalar_vec(R, 1)
    joint_mem = _bound_bot_chain(evals_mem, challenges_mem)
    r_joint_mem = challenges_mem + list(rand_mem)
    transcript.append_scalar(joint_mem, R)
    if not polycommit.verify_plain(
        proof.proof_mem, gens.gens_mem, transcript, r_joint_mem, joint_mem,
        comm.comm_comb_mem,
    ):
        return False

    if not _hash_layer_verify_helper(
        rand_mem, claims_row, eval_row_ops_val, row_addr, row_read, row_audit,
        rx, r_hash, r_multiset,
    ):
        return False
    if not _hash_layer_verify_helper(
        rand_mem, claims_col, eval_col_ops_val, col_addr, col_read, col_audit,
        ry, r_hash, r_multiset,
    ):
        return False
    return True


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


@dataclass
class SparseMatPolyEvalProof:
    comm_derefs: DerefsCommitment
    proof_prod_layer: ProductLayerProof
    proof_hash_layer: HashLayerProof


def _equalize(rx: List[int], ry: List[int]):
    if len(rx) < len(ry):
        return [0] * (len(ry) - len(rx)) + list(rx), list(ry)
    if len(rx) > len(ry):
        return list(rx), [0] * (len(rx) - len(ry)) + list(ry)
    return list(rx), list(ry)


def prove(dense_rep: MultiSparseMatPolynomialAsDense, rx, ry, evals,
          gens: SparseMatPolyCommitmentGens, transcript) -> SparseMatPolyEvalProof:
    """SparseMatPolyEvalProof::prove (sparse_mlpoly.rs:1473-1532)."""
    assert len(evals) == dense_rep.batch_size
    rx_ext, ry_ext = _equalize(rx, ry)
    mem_rx = dense.eq_evals(rx_ext)
    mem_ry = dense.eq_evals(ry_ext)

    derefs = Derefs.new(
        dense_rep.row.deref(mem_rx), dense_rep.col.deref(mem_ry)
    )
    comm_derefs = derefs.commit(gens.gens_derefs)
    comm_derefs.write_to_transcript(transcript)

    r_mem_check = transcript.challenge_scalar_vec(R, 2)
    row_layers = build_layers(mem_rx, dense_rep.row, derefs.row_ops_val,
                              (r_mem_check[0], r_mem_check[1]))
    col_layers = build_layers(mem_ry, dense_rep.col, derefs.col_ops_val,
                              (r_mem_check[0], r_mem_check[1]))

    proof_prod, rand_mem, rand_ops = product_layer_prove(
        row_layers, col_layers, dense_rep, derefs, evals, transcript
    )
    proof_hash = hash_layer_prove(
        (rand_mem, rand_ops), dense_rep, derefs, gens, transcript
    )
    return SparseMatPolyEvalProof(comm_derefs, proof_prod, proof_hash)


def verify(proof: SparseMatPolyEvalProof, comm: SparseMatPolyCommitment,
           rx, ry, evals, gens: SparseMatPolyCommitmentGens, transcript) -> bool:
    """SparseMatPolyEvalProof::verify (sparse_mlpoly.rs:1534-1568).

    Returns False on any failed check (the inner layers signal failure by
    raising; unlike the reference — whose verifier asserts panic,
    mipp.rs:250-317 — this matches the bool contract of every other
    verifier in this package).
    """
    try:
        return _verify_inner(proof, comm, rx, ry, evals, gens, transcript)
    except (AssertionError, ProofVerifyError):
        return False


def _verify_inner(proof: SparseMatPolyEvalProof, comm: SparseMatPolyCommitment,
                  rx, ry, evals, gens: SparseMatPolyCommitmentGens,
                  transcript) -> bool:
    rx_ext, ry_ext = _equalize(rx, ry)
    nz, num_mem_cells = comm.num_ops, comm.num_mem_cells
    assert (1 << len(rx_ext)) == num_mem_cells

    proof.comm_derefs.write_to_transcript(transcript)
    r_mem_check = transcript.challenge_scalar_vec(R, 2)

    num_instances = len(evals)
    claims_mem, rand_mem, claims_ops, claims_dotp, rand_ops = (
        product_layer_verify(proof.proof_prod_layer, nz, num_mem_cells,
                             evals, transcript)
    )
    assert len(claims_mem) == 4
    assert len(claims_ops) == 4 * num_instances
    assert len(claims_dotp) == 3 * num_instances

    claims_ops_row = claims_ops[: 2 * num_instances]
    claims_ops_col = claims_ops[2 * num_instances :]
    row_read = claims_ops_row[:num_instances]
    row_write = claims_ops_row[num_instances:]
    col_read = claims_ops_col[:num_instances]
    col_write = claims_ops_col[num_instances:]

    return hash_layer_verify(
        proof.proof_hash_layer,
        (rand_mem, rand_ops),
        (claims_mem[0], row_read, row_write, claims_mem[1]),
        (claims_mem[2], col_read, col_write, claims_mem[3]),
        claims_dotp,
        comm,
        gens,
        proof.comm_derefs,
        rx_ext,
        ry_ext,
        r_mem_check[0],
        r_mem_check[1],
        transcript,
    )
