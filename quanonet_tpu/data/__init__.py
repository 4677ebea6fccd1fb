from quanonet_tpu.data.manager import DataManager
