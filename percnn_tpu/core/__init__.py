"""Model core: recurrent cells, rollout driver, ISG, losses, trainer."""
