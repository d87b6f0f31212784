"""Error types (mirror of /root/reference/src/errors.rs)."""


class ProofVerifyError(Exception):
    """Proof verification failure (errors.rs:4-14)."""


class InternalError(ProofVerifyError):
    pass


class InvalidInputLength(ProofVerifyError):
    def __init__(self, matrix_len: int, input_len: int):
        super().__init__(
            f"invalid input length: matrix {matrix_len}, input {input_len}"
        )


# R1CSError variants live in core/r1cs.py (InvalidIndex, InvalidScalar, ...)
