from evennicer_slam_tpu.data.datasets import get_dataset, dataset_dict, Frame
