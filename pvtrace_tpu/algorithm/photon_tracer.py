"""Reference per-ray photon tracer (the slow, fully general oracle).

Parity: reference ``pvtrace/algorithm/photon_tracer.py`` — identical
event semantics: container inference from intersection parity, EXIT on
hitting the root, Beer-Lambert absorption vs boundary distance,
component roulette, radiative/non-radiative branch, Fresnel surface
branch. This implementation is the validation oracle for the TPU device
tracer (the same role the reference's Python tracer plays for its
compiled engine) and the fallback for scenes the compiler rejects.
"""
import collections

import numpy as np

from pvtrace_tpu.geometry.utils import close_to_zero, distance_between
from pvtrace_tpu.light.event import Event
from pvtrace_tpu.material.component import Luminophore, Reactor, Scatterer


def find_container(intersections):
    """The node containing the ray: among nodes hit an odd/unique number
    of times, the one whose surface is closest (reference
    photon_tracer.py:26-57)."""
    if len(intersections) == 1:
        return intersections[0].hit
    count = collections.Counter(x.hit for x in intersections).most_common()
    candidates = [node for node, n in count if n == 1]
    pairs = [
        (x.hit, x.distance) for x in intersections if x.hit in candidates
    ]
    pairs.sort(key=lambda tup: tup[1])
    return pairs[0][0]


def next_hit(scene, ray):
    """Information about the next surface the ray hits.

    Returns (hit_node, (container, adjacent), point, distance) or None.
    """
    intersections = scene.intersections(ray.position, ray.direction)
    intersections = [x for x in intersections if not close_to_zero(x.distance)]
    intersections = [x.to(scene.root) for x in intersections]
    if len(intersections) == 0:
        return None
    hit = intersections[0]
    if len(intersections) == 1:
        hit_node = hit.hit
        return hit_node, (hit_node, None), hit.point, hit.distance
    container = find_container(intersections)
    point = hit.point
    hit_node = hit.hit
    distance = distance_between(ray.position, point)
    if container == hit_node:
        adjacent = intersections[1].hit
    else:
        adjacent = hit_node
    return hit_node, (container, adjacent), point, distance


def step_forward(scene, ray, maxsteps=1000, maxpathlength=np.inf, emit_method="kT"):
    """Generator of (Ray, Event, metadata) tuples — the physics loop."""
    count = 0
    yield (ray, Event.GENERATE, None)
    while True:
        count += 1
        info = next_hit(scene, ray)
        if info is None:
            break

        hit, (container, adjacent), point, full_distance = info

        if count > maxsteps or ray.travelled > maxpathlength:
            yield (
                ray,
                Event.KILL,
                {
                    "maxsteps": count,
                    "maxpathlength": ray.travelled,
                    "container": container.name,
                },
            )
            break

        refractive_index = container.geometry.material.refractive_index
        if hit is scene.root:
            yield (
                ray.propagate(full_distance, refractive_index),
                Event.EXIT,
                {
                    "hit": hit.name,
                    "container": container.name,
                    "adjacent": None if adjacent is None else adjacent.name,
                },
            )
            break

        material = container.geometry.material
        absorbed, at_distance = material.is_absorbed(ray, full_distance)
        if absorbed:
            ray = ray.propagate(at_distance, refractive_index)
            component = material.component(ray.wavelength)
            yield (
                ray,
                Event.ABSORB,
                {"component": component.name, "container": container.name},
            )
            if component.is_radiative(ray):
                ray = component.emit(
                    ray.representation(scene.root, container), method=emit_method
                ).representation(container, scene.root)
                if isinstance(component, Luminophore):
                    event = Event.EMIT
                elif isinstance(component, Scatterer):
                    event = Event.SCATTER
                else:
                    raise ValueError("Unknown component")
                yield (
                    ray,
                    event,
                    {
                        "component": component.name,
                        "emit_method": emit_method,
                        "container": container.name,
                    },
                )
                continue
            else:
                ray = component.nonradiative_absorb(ray)
                if isinstance(component, Reactor):
                    yield (
                        ray,
                        Event.REACT,
                        {"component": component.name, "container": container.name},
                    )
                else:
                    yield (
                        ray,
                        Event.NONRADIATIVE,
                        {"component": component.name, "container": container.name},
                    )
                break
        else:
            ray = ray.propagate(full_distance, refractive_index)
            surface = hit.geometry.material.surface
            # Normal and reflections/refractions are computed in the frame
            # of the hit node.
            local_ray = ray.representation(scene.root, hit)
            normal = hit.vector_to_node(
                hit.geometry.normal(local_ray.position), scene.root
            )
            if surface.is_reflected(local_ray, hit.geometry, container, adjacent):
                ray = surface.reflect(
                    local_ray, hit.geometry, container, adjacent
                ).representation(hit, scene.root)
                yield (
                    ray,
                    Event.REFLECT,
                    {
                        "hit": hit.name,
                        "container": container.name,
                        "adjacent": None if adjacent is None else adjacent.name,
                        "normal": normal,
                    },
                )
                continue
            else:
                ray = surface.transmit(
                    local_ray, hit.geometry, container, adjacent
                ).representation(hit, scene.root)
                yield (
                    ray,
                    Event.TRANSMIT,
                    {
                        "hit": hit.name,
                        "container": container.name,
                        "adjacent": adjacent.name,
                        "normal": normal,
                    },
                )
                continue


def follow(scene, ray, maxsteps=1000, maxpathlength=np.inf, emit_method="kT"):
    """Trace a ray and return its history as a list of (Ray, Event)."""
    history = list(
        step_forward(
            scene,
            ray,
            maxsteps=maxsteps,
            maxpathlength=maxpathlength,
            emit_method=emit_method,
        )
    )
    rays, events, _ = zip(*history)
    return list(zip(rays, events))
