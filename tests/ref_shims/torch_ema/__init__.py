"""Minimal torch_ema stand-in implementing the API surface used by the
reference (universe.py:122-133,801-805,832-874): shadow_params list in
``model_parameters()`` order, store/copy_to/restore, state_dict round trip.
Semantics mirror fadel/pytorch_ema 0.3 (the package the reference pins)."""
import torch


class ExponentialMovingAverage:
    def __init__(self, parameters, decay, use_num_updates=True):
        if decay < 0.0 or decay > 1.0:
            raise ValueError("Decay must be between 0 and 1")
        parameters = [p for p in parameters if p.requires_grad]
        self.decay = decay
        self.num_updates = 0 if use_num_updates else None
        self.shadow_params = [p.clone().detach() for p in parameters]
        self.collected_params = None
        self._params = parameters  # (real torch_ema keeps weakrefs)

    def _get_parameters(self, parameters):
        if parameters is None:
            return self._params
        return [p for p in parameters if p.requires_grad]

    def update(self, parameters=None):
        parameters = self._get_parameters(parameters)
        decay = self.decay
        if self.num_updates is not None:
            self.num_updates += 1
            decay = min(decay, (1 + self.num_updates) / (10 + self.num_updates))
        one_minus_decay = 1.0 - decay
        with torch.no_grad():
            for s_param, param in zip(self.shadow_params, parameters):
                s_param.sub_(one_minus_decay * (s_param - param))

    def copy_to(self, parameters=None):
        parameters = self._get_parameters(parameters)
        for s_param, param in zip(self.shadow_params, parameters):
            param.data.copy_(s_param.data)

    def store(self, parameters=None):
        parameters = self._get_parameters(parameters)
        self.collected_params = [p.clone() for p in parameters]

    def restore(self, parameters=None):
        if self.collected_params is None:
            raise RuntimeError("no stored parameters to restore")
        parameters = self._get_parameters(parameters)
        for c_param, param in zip(self.collected_params, parameters):
            param.data.copy_(c_param.data)

    def to(self, *args, **kwargs):
        self.shadow_params = [p.to(*args, **kwargs) for p in self.shadow_params]
        if self.collected_params is not None:
            self.collected_params = [
                p.to(*args, **kwargs) for p in self.collected_params
            ]
        return self

    def state_dict(self):
        return {
            "decay": self.decay,
            "num_updates": self.num_updates,
            "shadow_params": self.shadow_params,
            "collected_params": self.collected_params,
        }

    def load_state_dict(self, state_dict):
        self.decay = state_dict["decay"]
        self.num_updates = state_dict["num_updates"]
        self.shadow_params = state_dict["shadow_params"]
        self.collected_params = state_dict["collected_params"]
