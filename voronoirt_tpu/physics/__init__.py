"""Units-free physics library (L2 of the reference layer map)."""

from .planck import B_lambda, B_nu
from .voigt import voigt_H, voigt_profile, doppler_profile, humlicek_w
from .opacity import (alpha_absorption, alpha_scattering, thomson,
                      rayleigh_h, hminus_ff, hminus_bf, hydrogenic_ff,
                      h2plus_ff, h2plus_bf)
from .broadening import gamma_constant, damping, n_eff
from .collisions import (coll_exc_hydrogen_johnson,
                         coll_ion_hydrogen_johnson, expint_E1, expint_E2)
from .lte import lte_populations
from .atom import (HydrogenicLine, make_line, lyman_alpha_line, doppler_width,
                   line_of_sight_velocity, compute_profile, alpha_line,
                   destruction, source_line, sample_lambda_line,
                   sample_lambda_boundfree, transition_lambda)
from .rates import calculate_R, calculate_C, sigma_ij_bb, sigma_ic, Gij, Cij, gaunt_bf
from .stateq import get_revised_populations
