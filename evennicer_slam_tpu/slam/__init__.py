from evennicer_slam_tpu.slam.tracker import Tracker, TrackerConfig
from evennicer_slam_tpu.slam.mapper import Mapper, MapperConfig
from evennicer_slam_tpu.slam.pipeline import EvenNICERSLAM
