"""Minimal pytorch_lightning stand-in: just enough ``LightningModule`` to
construct the reference Universe/UniverseGAN, run inference paths, and drive
``training_step`` manually for the train-dynamics golden test (the hooks a
manual-optimization step touches: ``optimizers``/``lr_schedulers``/
``manual_backward``/``global_step`` — reference universe_gan.py:151-302)."""
import torch


class LightningModule(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.automatic_optimization = True
        self.trainer = None
        self._optimizers = None
        self._schedulers = None
        self._global_step = 0
        self.current_epoch = 0
        self.logged = {}

    # --- manual-optimization hooks (driven by the golden train-step test) ---
    def set_optimizers(self, optimizers, schedulers=None):
        self._optimizers = optimizers
        self._schedulers = schedulers

    def optimizers(self):
        return self._optimizers

    def lr_schedulers(self):
        if self._schedulers is None:
            # the reference catches TypeError to detect "no schedulers"
            raise TypeError("no schedulers configured")
        return self._schedulers

    def manual_backward(self, loss):
        loss.backward()

    def save_hyperparameters(self, *args, **kwargs):
        pass

    def log(self, name=None, value=None, *args, **kwargs):
        if name is not None:
            self.logged[name] = value

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
        return self._global_step

    @global_step.setter
    def global_step(self, v):
        self._global_step = v


def seed_everything(seed):
    torch.manual_seed(seed)
