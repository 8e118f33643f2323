from .lambda_returns import gve_scan, gae_scan, lambda_return
