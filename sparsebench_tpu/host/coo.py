"""COO (coordinate) host matrix — the reference's ``MMMatrix`` analog.

The reference stores Matrix-Market entries as an array-of-structs
``MMEntry {row, col, val}`` (src/matrix.h:37-48); here the natural numpy
representation is struct-of-arrays. Entries are kept in the same canonical
order the reference produces: sorted by row with ties broken by column
(src/matrix.c:219-228 sorts by column, then stable-sorts by row).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class COOMatrix:
    """Sparse matrix in coordinate form (host, numpy).

    Attributes mirror the reference MMMatrix (src/matrix.h:41-48): ``nr``
    rows, ``nnz`` stored entries, plus the partition bookkeeping fields used
    on the distributed ingest path (src/comm.c:311-412).
    """

    row: np.ndarray  # int64[nnz]
    col: np.ndarray  # int64[nnz]
    val: np.ndarray  # float64[nnz]
    nr: int
    nc: int
    # Partition bookkeeping (filled by the distribute step; defaults are the
    # single-shard values, matching reference semantics).
    start_row: int = 0
    stop_row: int = -1  # inclusive, like reference GMatrix.stopRow
    total_nr: int = -1
    total_nnz: int = -1

    def __post_init__(self) -> None:
        if self.stop_row < 0:
            self.stop_row = self.nr - 1
        if self.total_nr < 0:
            self.total_nr = self.nr
        if self.total_nnz < 0:
            self.total_nnz = int(self.nnz)

    @property
    def nnz(self) -> int:
        return int(self.row.shape[0])

    def sort_row_major(self) -> "COOMatrix":
        """Sort entries by (row, col) — canonical reference order.

        The reference achieves this with qsort-by-col + stable-sort-by-row
        (src/matrix.c:219-228); ``np.lexsort`` gives the identical result in
        one pass (primary key last).
        """
        order = np.lexsort((self.col, self.row))
        self.row = self.row[order]
        self.col = self.col[order]
        self.val = self.val[order]
        return self
