from evennicer_slam_tpu.render.renderer import Renderer, RenderSettings
