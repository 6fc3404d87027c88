"""Minimal pytorch_lightning stand-in: just enough ``LightningModule`` to
construct the reference Universe/UniverseGAN and run inference paths
(no Trainer; training hooks are never exercised in the golden tests)."""
import torch


class LightningModule(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.automatic_optimization = True
        self.trainer = None

    def save_hyperparameters(self, *args, **kwargs):
        pass

    def log(self, *args, **kwargs):
        pass

    def log_dict(self, *args, **kwargs):
        pass

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")

    @property
    def global_step(self):
        return 0


def seed_everything(seed):
    torch.manual_seed(seed)
