from .lambda_returns import (
    gve_pallas, gae_pallas, gve_scan, gae_scan, lambda_return)
