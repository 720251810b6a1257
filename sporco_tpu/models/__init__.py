"""Problem classes ("models"): each assembles a params pytree plus a
static bundle of pure step functions and drives it with the generic
ADMM or PGM loop drivers."""
