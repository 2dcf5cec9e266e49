from libdmet_preview_tpu.models.lattice import (
    UnitCell, SuperCell, LatticeModel, BipartiteSquare,
    ChainLattice, SquareLattice, SquareAFM, Square3Band, Square3BandAFM,
    Square3BandSymm, CubicLattice, HoneycombLattice,
)
from libdmet_preview_tpu.models.hamiltonian import (
    HamNonInt, HubbardHamiltonian, Hubbard3band, Hubbard3band_ref,
)
